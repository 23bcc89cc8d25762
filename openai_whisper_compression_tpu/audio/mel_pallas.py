"""Fused Pallas log-mel kernel: windowed-DFT → power → mel → log10 in one pass.

The STFT is computed as matmuls against fixed windowed cos/sin bases, so the
whole frontend is MXU work (a TPU-native replacement for the
numpy-inside-`WhisperProcessor` path the reference uses, `data_utils.py:56-58`).
One grid step processes a (frame-tile × n_fft) block:

    re  = frames @ cosB      (BM,512)@(512,256) MXU
    im  = frames @ sinB
    mel = (re²+im²) @ melT   (BM,256)@(256,128) MXU
    out = log10(max(mel, 1e-10))                VPU

All operands are zero-padded to MXU-aligned shapes on the host once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import N_FFT
from .features import dft_mel_bases, frame_waveform

BM = 256          # frames per grid step
KP = 512          # n_fft (400) padded
NF = 256          # freq bins (201) padded
NMEL_PAD = 128    # mel bins (80 or 128) padded


@functools.lru_cache(maxsize=4)
def _padded_bases(n_mels: int):
    cos_b, sin_b, mel_fb = dft_mel_bases(n_mels)
    cos_p = np.zeros((KP, NF), np.float32)
    sin_p = np.zeros((KP, NF), np.float32)
    mel_p = np.zeros((NF, NMEL_PAD), np.float32)
    cos_p[:N_FFT, :cos_b.shape[1]] = cos_b
    sin_p[:N_FFT, :sin_b.shape[1]] = sin_b
    mel_p[:mel_fb.shape[0], :n_mels] = mel_fb
    return cos_p, sin_p, mel_p


def _mel_kernel(frames_ref, cos_ref, sin_ref, mel_ref, out_ref):
    f = frames_ref[0]
    re = jnp.dot(f, cos_ref[:], preferred_element_type=jnp.float32)
    im = jnp.dot(f, sin_ref[:], preferred_element_type=jnp.float32)
    re = re.astype(jnp.float32)
    im = im.astype(jnp.float32)
    power = re * re + im * im
    mel = jnp.dot(power, mel_ref[:], preferred_element_type=jnp.float32)
    out_ref[0] = jnp.log(jnp.maximum(mel, 1e-10)) * np.float32(1.0 / np.log(10.0))


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def log_mel_pallas(wav: jax.Array, n_mels: int = 80,
                   dft_dtype=jnp.float32) -> jax.Array:
    """Waveform batch (B, N_SAMPLES) -> log-mel (B, n_mels, 3000).

    Same output as `features.log_mel` (golden-tested); interpreted off-TPU.
    dft_dtype=bfloat16 runs the DFT matmuls at bf16 MXU rate (fp32 accum).
    """
    frames = frame_waveform(wav)  # (B, F, 400)
    b, f, _ = frames.shape
    fp = -(-f // BM) * BM
    frames = jnp.pad(frames, ((0, 0), (0, fp - f), (0, KP - N_FFT)))
    frames = frames.astype(dft_dtype)
    cos_p, sin_p, mel_p = _padded_bases(n_mels)
    cos_p = cos_p.astype(dft_dtype)
    sin_p = sin_p.astype(dft_dtype)

    grid = (b, fp // BM)
    out = pl.pallas_call(
        _mel_kernel,
        out_shape=jax.ShapeDtypeStruct((b, fp, NMEL_PAD), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, BM, KP), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, NF), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((KP, NF), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((NF, NMEL_PAD), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, BM, NMEL_PAD), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * fp * KP * NF * 2 + 2 * b * fp * NF * NMEL_PAD,
            bytes_accessed=frames.size * 4 + b * fp * NMEL_PAD * 4,
            transcendentals=b * fp * NMEL_PAD,
        ),
        interpret=_interpret(),
    )(frames, jnp.asarray(cos_p), jnp.asarray(sin_p), jnp.asarray(mel_p))

    log_spec = out[:, : f - 1, :n_mels]  # drop trailing frame (HF parity)
    log_spec = jnp.maximum(
        log_spec, jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0)
    log_spec = (log_spec + 4.0) / 4.0
    return log_spec.transpose(0, 2, 1)
