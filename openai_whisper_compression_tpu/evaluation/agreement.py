"""Compression-accuracy agreement harness.

With no pretrained weights or labeled data available (offline TPU pods), WER
deltas can't be measured directly — instead this measures how faithfully a
compressed model tracks its uncompressed baseline: greedy-token agreement,
top-1 logit agreement, and mean KL of the output distributions on shared
inputs. A compressed model with ~100% token agreement is WER-neutral by
construction; the quant lab's tests use these numbers as accuracy gates.
(No reference counterpart — the reference always re-evaluates WER on
LibriSpeech, `quantization.py:149-208`.)
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, WhisperArch
from ..models import decode
from ..models.whisper import decode_logits, encode

# Jitted entry points with STATIC arch/cfg (DecodeConfig is frozen):
# the eager calls these replace dispatch hundreds of per-op executions
# through a tunnelled backend (~100x one compiled program — the same
# trap the verify notes document). jax.jit's cache keys on the params
# pytree SHAPE, so repeated rungs of one sweep reuse their compiles.
@functools.partial(jax.jit, static_argnums=(1,))
def _encode_j(params, arch, mel):
    return encode(params, arch, mel)


@functools.partial(jax.jit, static_argnums=(1,))
def _logits_j(params, arch, tokens, enc):
    return decode_logits(params, arch, tokens, enc)


@functools.partial(jax.jit, static_argnums=(1, 3))
def _greedy_j(params, arch, enc_out, cfg):
    return decode.greedy_decode(params, arch, enc_out, cfg)


def model_agreement(base_params: Any, comp_params: Any, arch: WhisperArch,
                    mels: jax.Array, decode_cfg: DecodeConfig | None = None,
                    teacher_tokens: jax.Array | None = None,
                    comp_cfg: DecodeConfig | None = None) -> dict[str, float]:
    """-> {token_agreement, top1_agreement, mean_kl, logit_rel_err}.

    comp_cfg: optional decode config for the COMPRESSED side only — used
    to score decode-time lossy knobs (encoder token merging,
    models/merge.py) against the dense/unmerged baseline decode."""
    decode_cfg = decode_cfg or DecodeConfig(
        max_new_tokens=16, language_token_id=None, task_token_id=None,
        notimestamps=False)
    comp_cfg = comp_cfg or decode_cfg

    enc_b = _encode_j(base_params, arch, mels)
    enc_c = _encode_j(comp_params, arch, mels)
    # teacher-forced comp logits must see the same merged sequence the
    # comp decode attends to (greedy_decode merges internally from cfg)
    enc_c_tf = enc_c
    if comp_cfg.cross_kv_pool > 1 or comp_cfg.cross_kv_merge > 0:
        from ..models.merge import merge_encoder_tokens

        enc_c_tf = merge_encoder_tokens(enc_c, pool=comp_cfg.cross_kv_pool,
                                        merge_r=comp_cfg.cross_kv_merge)

    t_b, l_b = _greedy_j(base_params, arch, enc_b, decode_cfg)
    t_c, l_c = _greedy_j(comp_params, arch, enc_c, comp_cfg)
    t_b, t_c = np.asarray(t_b), np.asarray(t_c)
    l_b, l_c = np.asarray(l_b), np.asarray(l_c)
    agree = []
    for i in range(t_b.shape[0]):
        n = int(min(l_b[i], l_c[i]))
        agree.append(float(np.mean(t_b[i, :n] == t_c[i, :n])))
    token_agreement = float(np.mean(agree))

    if teacher_tokens is None:
        width = min(8, t_b.shape[1])
        teacher_tokens = jnp.asarray(t_b[:, :width].astype(np.int32))
    lg_b = _logits_j(base_params, arch, teacher_tokens,
                     enc_b).astype(jnp.float32)
    lg_c = _logits_j(comp_params, arch, teacher_tokens,
                     enc_c_tf).astype(jnp.float32)
    p = jax.nn.log_softmax(lg_b, axis=-1)
    q = jax.nn.log_softmax(lg_c, axis=-1)
    kl = jnp.sum(jnp.exp(p) * (p - q), axis=-1)
    top1 = jnp.mean(jnp.argmax(lg_b, -1) == jnp.argmax(lg_c, -1))
    rel = jnp.linalg.norm(lg_b - lg_c) / jnp.linalg.norm(lg_b)
    return {
        "token_agreement": token_agreement,
        "top1_agreement": float(top1),
        "mean_kl": float(jnp.mean(kl)),
        "logit_rel_err": float(rel),
    }
