"""Pallas TPU kernels for quantized matmuls.

Weight-only quantized inference is HBM-bandwidth-bound in the decode loop;
XLA materializes dequantized matmul operands, so a fused Pallas kernel that
reads int8/int4 weights straight from HBM and dequantizes in VMEM cuts weight
traffic 4–8× vs fp32 (the native-kernel role bnb/quanto CUDA kernels play for
the reference, `model_utils.py:126-134`).

Kernel shape: grid over (M, N) tiles with full-K operand blocks (Whisper's
K ≤ 5120 keeps every tile well inside VMEM):

    y[BM, BN] = (x[BM, K] @ dequant(w[K, BN])) * scale[BN]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pad_dim(n: int, m: int) -> int:
    return -(-n // m) * m


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _int4_kernel(x_ref, w_ref, s_ref, o_ref):
    # split-half packed: byte row k holds w[k] (low nibble) and w[k + K/2]
    # (high nibble); unpack = two shifts + concat, no interleave.
    u = w_ref[:].astype(jnp.int32) & 0xFF
    lo = u & 0xF
    hi = (u >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def int8_matmul_pallas(x: jax.Array, w_int8: jax.Array, scale: jax.Array,
                       block_m: int = 256, block_n: int = 256) -> jax.Array:
    """x (M, K) float • w (K, N) int8 • scale (1, N) -> (M, N) in x.dtype."""
    m, k = x.shape
    kw, n = w_int8.shape
    assert kw == k
    bm = min(block_m, _pad_dim(m, 16))
    bn = min(block_n, _pad_dim(n, 128))
    mp, np_, kp = _pad_dim(m, bm), _pad_dim(n, bn), _pad_dim(k, 128)
    x_p = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    w_p = jnp.pad(w_int8, ((0, kp - k), (0, np_ - n)))
    s_p = jnp.pad(scale.reshape(1, -1), ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        _int8_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x_p, w_p, s_p)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("k", "block_m", "block_n"))
def int4_matmul_pallas(x: jax.Array, w_packed: jax.Array, scale: jax.Array,
                       k: int, block_m: int = 256,
                       block_n: int = 256) -> jax.Array:
    """x (M, K) float • packed w (K/2, N) int8 (split-half int4) • scale
    (1, N) -> (M, N)."""
    m, kx = x.shape
    assert kx == k and w_packed.shape[0] == k // 2
    n = w_packed.shape[1]
    bm = min(block_m, _pad_dim(m, 16))
    bn = min(block_n, _pad_dim(n, 128))
    # pad K/2 to a multiple of 128 so both halves stay aligned
    kh = k // 2
    khp = _pad_dim(kh, 128)
    mp, np_ = _pad_dim(m, bm), _pad_dim(n, bn)
    # x halves must match the unpacked concat order [0:kh | kh:k] + padding
    x_lo = jnp.pad(x[:, :kh], ((0, mp - m), (0, khp - kh)))
    x_hi = jnp.pad(x[:, kh:], ((0, mp - m), (0, khp - kh)))
    x_p = jnp.concatenate([x_lo, x_hi], axis=1)  # (mp, 2*khp)
    w_p = jnp.pad(w_packed, ((0, khp - kh), (0, np_ - n)))
    s_p = jnp.pad(scale.reshape(1, -1), ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        _int4_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, 2 * khp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((khp, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * 2 * khp,
            bytes_accessed=mp * khp * 4 + khp * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x_p, w_p, s_p)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Fused w8a8 matmul: activation int8-quantization + int8×int8 MXU contraction
# + dequant epilogue in ONE kernel. This is what makes the reference's
# dynamic/static activation-quant configs (`torch.quantization.quantize_dynamic`
# at `model_utils.py:131-134`; quanto static at `model_utils.py:152-214`)
# actually FAST on TPU: XLA's staged act-quant chain measured ~1.8 ms for a
# (24k, 768)x(768, 3072) layer vs 0.6 ms bf16; this kernel runs it in
# ~0.16 ms (int8 MXU rate, quantization fused on the VPU while the MXU works).
# ---------------------------------------------------------------------------


def _w8a8_kernel(x_ref, w_ref, sw_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx
                * sw_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _w8a8_static_kernel(x_ref, w_ref, sw_ref, sx_ref, o_ref):
    sx = sx_ref[0, 0].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx
                * sw_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def w8a8_matmul_pallas(x: jax.Array, w_int8: jax.Array, w_scale: jax.Array,
                       act_scale: jax.Array | None = None,
                       block_m: int = 128) -> jax.Array:
    """x (M, K) float • w (K, N) int8 • w_scale (1, N) -> (M, N) in x.dtype.

    act_scale None: dynamic per-row absmax activation quantization (fused).
    act_scale scalar: frozen calibrated scale (static quant semantics).
    The whole (K, N) weight stays VMEM-resident across M blocks.
    """
    m, k = x.shape
    kw, n = w_int8.shape
    assert kw == k
    bm = min(block_m, _pad_dim(m, 16))
    mp, kp, np_ = _pad_dim(m, bm), _pad_dim(k, 128), _pad_dim(n, 128)
    x_p = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    w_p = jnp.pad(w_int8, ((0, kp - k), (0, np_ - n)))
    s_p = jnp.pad(w_scale.reshape(1, -1), ((0, 0), (0, np_ - n)))

    in_specs = [
        pl.BlockSpec((bm, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((kp, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x_p, w_p, s_p]
    kernel = _w8a8_kernel
    if act_scale is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(act_scale, jnp.float32).reshape(1, 1))
        kernel = _w8a8_static_kernel

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, np_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    return out[:m, :n]
