"""Fused Pallas attention for the encoder (non-causal, fixed context).

XLA materializes the (B·H, T, T) score matrix in HBM for Whisper's
1500-frame encoder self-attention — at batch 64 that is gigabytes of traffic
per layer and the dominant encoder cost. This kernel keeps scores in VMEM:
one grid step per (batch·head), q processed in blocks with k/v read once,
softmax fused, fp32 accumulation. Encoder context is constant (SURVEY.md §5)
so everything is static-shape; padded key positions are masked with an iota
threshold.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, t_valid: int,
                 block_q: int):
    t_pad = k_ref.shape[1]
    kT = k_ref[0]  # (T, Dh)
    v = v_ref[0]
    n_blocks = q_ref.shape[1] // block_q

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (block_q, t_pad), 1)
    key_mask = jnp.where(col_ids < t_valid, 0.0, NEG_INF).astype(jnp.float32)

    def body(i, _):
        q = q_ref[0, pl.ds(i * block_q, block_q), :]  # (BQ, Dh)
        scores = jax.lax.dot_general(
            q * scale, kT, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # (BQ, T)
        scores = scores + key_mask
        m = jnp.max(scores, axis=-1, keepdims=True)
        p = jnp.exp(scores - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) / l
        o_ref[0, pl.ds(i * block_q, block_q), :] = out.astype(o_ref.dtype)
        return 0

    jax.lax.fori_loop(0, n_blocks, body, 0)


@functools.partial(jax.jit, static_argnames=("block_q",))
def encoder_attention_pallas(q: jax.Array, k: jax.Array, v: jax.Array,
                             block_q: int = 512) -> jax.Array:
    """Full (non-causal) attention, (B, H, T, Dh) -> (B, H, T, Dh).

    q is expected unscaled; the 1/sqrt(Dh) scaling is applied in-kernel.
    """
    b, h, t, dh = q.shape
    scale = float(dh) ** -0.5
    bh = b * h
    t_pad = -(-t // 128) * 128
    block_q = min(block_q, t_pad)
    while t_pad % block_q:
        block_q //= 2

    def flat(x):
        x = x.reshape(bh, t, dh)
        return jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))

    qf, kf, vf = flat(q), flat(k), flat(v)

    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=scale, t_valid=t,
                          block_q=block_q),
        out_shape=jax.ShapeDtypeStruct((bh, t_pad, dh), q.dtype),
        grid=(bh,),
        in_specs=[
            pl.BlockSpec((1, t_pad, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t_pad, dh), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t_pad, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * t_pad * t_pad * dh,
            bytes_accessed=4 * bh * t_pad * dh * q.dtype.itemsize,
            transcendentals=bh * t_pad * t_pad),
        interpret=_interpret(),
    )(qf, kf, vf)
    return out[:, :t, :].reshape(b, h, t, dh)
