"""Fused Pallas cross-attention for the decode loop (q_len == 1).

Cross-attention dominates Whisper's decode step: every generated token
re-reads the full per-layer encoder K/V (B·H·1500·64 ≈ 295 MB/layer at
batch 64 bf16 — 3.5 GB/step over 12 layers). Measured on v5e, XLA's einsum
path streams this at only ~200-300 GB/s (it pads head_dim 64 → 128 for the
MXU, doubling traffic), making cross-attention ~12 of the 14 ms decode step
(this replaces the role HF's fused SDPA plays for the reference's
`model.generate`, `data_utils.py:152`).

This kernel stores K/V **transposed** — (BH, Dh, S) with Dh=64 sublanes and
S lanes, exactly tile-aligned for bf16/int8 — blocks G (b·h) pairs per grid
step so DMA transfers are MBs not KBs, and fuses score, softmax and value
reduction in VMEM as VPU multiply+lane/sublane reductions (q_len == 1 makes
MXU matmuls degenerate):

    scores[g, s] = sum_d q[g, d] * k_t[g, d, s]
    p            = softmax(scores)  (masked beyond s_valid)
    out[g, d]    = sum_s p[g, s] * v_t[g, d, s]

int8 K/V dequantization is folded into the (G, S) score/probability planes
(k's per-position scale multiplies scores, v's scale multiplies p), so the
kernel reads HALF the bytes and never materializes a dequantized tensor —
the fusion the XLA int8 path lacks (see `models.whisper.precompute_cross_kv`).
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


def _fit_block_g(block_g: int, bh: int, dh_store: int, s_pad: int,
                 kv_dtype) -> int:
    """Largest (b·h) block fitting the scoped-VMEM budget: k/v blocks
    double-buffered plus in-kernel f32 working copies. Calibrated on v5e:
    f32 K/V at g=16 (dh=64, s_pad=1536) measured 24 MB scoped against the
    16 MB limit; the benched bf16/int8 g=16 defaults stay unchanged under
    this bound (12.6 / 6.3 MB)."""
    g = block_g
    itemsize = jnp.dtype(kv_dtype).itemsize
    while g > 1 and g * dh_store * s_pad * itemsize * 4 > 14 * 1024 * 1024:
        g //= 2
    while bh % g:
        g //= 2
    if g % 8 and g != bh:
        # Mosaic: the q block's (g, dh) leading dim must be a multiple of 8
        # or the full bh. bh % 8 != 0 (e.g. B=2, H=6 -> 12) lands on an
        # invalid 4/2/1 — take the whole array as one block (such bh are
        # small-odd x {1,2,4}, so the K/V block still fits VMEM).
        g = bh
    return g


def _softmax_masked(scores: jax.Array, s_valid: int) -> tuple[jax.Array, jax.Array]:
    g, s_pad = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, s_pad), 1)
    scores = jnp.where(col < s_valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    return p, jnp.sum(p, axis=-1, keepdims=True)


def _dot_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """(G, Dh) × (G, Dh, S) -> (G, S) via batched dot_general (lowers ~30%
    faster on v5e than the broadcast-reduce formulation)."""
    return jax.lax.dot_general(
        q[:, None, :], k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]


def _dot_values(p: jax.Array, v: jax.Array) -> jax.Array:
    """(G, S) × (G, Dh, S) -> (G, Dh) via batched dot_general."""
    return jax.lax.dot_general(
        p[:, None, :], v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]


def _kernel(q_ref, k_ref, v_ref, o_ref, *, s_valid: int):
    q = q_ref[:].astype(jnp.float32)               # (G, Dh)
    k = k_ref[:].astype(jnp.float32)               # (G, Dh, S)
    scores = _dot_scores(q, k)                     # (G, S)
    p, l = _softmax_masked(scores, s_valid)
    v = v_ref[:].astype(jnp.float32)               # (G, Dh, S)
    out = _dot_values(p / l, v)                    # (G, Dh)
    o_ref[:] = out.astype(o_ref.dtype)


def _kernel_int8(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, s_valid: int):
    q = q_ref[:].astype(jnp.float32)               # (G, Dh)
    k = k_ref[:].astype(jnp.float32)               # (G, Dh, S) int8 -> f32
    scores = _dot_scores(q, k)                     # (G, S)
    scores = scores * ks_ref[:, 0, :]              # fold k dequant scale
    p, l = _softmax_masked(scores, s_valid)
    p = p * vs_ref[:, 0, :]                        # fold v dequant scale
    v = v_ref[:].astype(jnp.float32)
    out = _dot_values(p / l, v)
    o_ref[:] = out.astype(o_ref.dtype)


def _nibbles4(packed: jax.Array) -> tuple[jax.Array, jax.Array]:
    """(G, Dh/2, S) split-half packed int4 -> (lo, hi) halves, each
    (G, Dh/2, S) f32. Byte row d holds element d (low nibble) and
    d + Dh/2 (high nibble) — the split-half scheme of ops.quant_matmul.

    Sign extension via shift pairs only (the int8 bytes arrive
    sign-extended into int32, so `>> 4` is already the signed high nibble
    and `<< 28 >> 28` the signed low one) — measured cheaper on the VPU
    than the mask+compare+where chain this replaces (r1 used 6 ops/byte +
    a full (G, Dh, S) concat materialization)."""
    u = packed.astype(jnp.int32)
    lo = ((u << 28) >> 28).astype(jnp.float32)
    hi = (u >> 4).astype(jnp.float32)
    return lo, hi


def _unpack4(packed: jax.Array) -> jax.Array:
    """(G, Dh/2, S) packed int4 -> (G, Dh, S) f32 (beam path)."""
    lo, hi = _nibbles4(packed)
    return jnp.concatenate([lo, hi], axis=1)


def _kernel_int4(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *, s_valid: int):
    # Split-dot form: score/value contractions run per nibble-half and sum/
    # concat, so the (G, Dh, S) unpacked tensor is never materialized —
    # only the (G, S) score vectors and (G, Dh/2) value partials.
    q = q_ref[:].astype(jnp.float32)               # (G, Dh)
    dh2 = k_ref.shape[1]
    k_lo, k_hi = _nibbles4(k_ref[:])               # (G, Dh/2, S) each
    scores = _dot_scores(q[:, :dh2], k_lo) + _dot_scores(q[:, dh2:], k_hi)
    scores = scores * ks_ref[:, 0, :]
    p, l = _softmax_masked(scores, s_valid)
    p = (p / l) * vs_ref[:, 0, :]
    v_lo, v_hi = _nibbles4(v_ref[:])
    out = jnp.concatenate([_dot_values(p, v_lo), _dot_values(p, v_hi)],
                          axis=1)                  # (G, Dh)
    o_ref[:] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("s_valid", "block_g"))
def decode_cross_attention(q: jax.Array, k_t: jax.Array, v_t: jax.Array,
                           k_scale: jax.Array | None = None,
                           v_scale: jax.Array | None = None,
                           s_valid: int | None = None,
                           block_g: int = 8) -> jax.Array:
    """One-token cross-attention over transposed K/V.

    q: (BH, Dh) — pre-scaled by 1/sqrt(Dh).
    k_t/v_t: (BH, Dh, S_pad) bf16, or int8 with k_scale/v_scale (BH, 1, S_pad)
    fp32 per-position absmax scales. Pad S with `pad_cross_len` and pass the
    true length as s_valid (padded positions are masked in-kernel).
    block_g: (b·h) pairs per grid step (VMEM budget permitting).

    Returns (BH, Dh) in q.dtype.
    """
    bh, dh = q.shape
    s_pad = k_t.shape[2]
    s_valid = s_pad if s_valid is None else s_valid
    g = _fit_block_g(block_g, bh, k_t.shape[1], s_pad, k_t.dtype)

    if k_scale is None:
        kernel = functools.partial(_kernel, s_valid=s_valid)
        operands = (q, k_t, v_t)
        in_specs = [
            pl.BlockSpec((g, dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, dh, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, dh, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        bytes_acc = bh * (2 * dh * s_pad * k_t.dtype.itemsize + 4 * dh)
    else:
        dh_store = k_t.shape[1]  # Dh (int8) or Dh/2 (split-half packed int4)
        kern = _kernel_int4 if dh_store == dh // 2 else _kernel_int8
        kernel = functools.partial(kern, s_valid=s_valid)
        operands = (q, k_t, k_scale, v_t, v_scale)
        in_specs = [
            pl.BlockSpec((g, dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, dh_store, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, dh_store, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((g, 1, s_pad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ]
        bytes_acc = bh * (2 * dh_store * s_pad + 8 * s_pad + 4 * dh)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, dh), q.dtype),
        grid=(bh // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, dh), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s_pad * dh,
            bytes_accessed=bytes_acc,
            transcendentals=bh * s_pad),
        interpret=_interpret(),
    )(*operands)


def pad_cross_len(s: int) -> int:
    """S padded to the lane width (128)."""
    return -(-s // 128) * 128


# ---------------------------------------------------------------------------
# Fused transpose + int8-quantize for cross-KV precompute: (B, S, H·Dh)
# projection output -> kernel-layout ((B·H, Dh, S_pad) int8, (B·H, 1, S_pad)
# scales) in ONE pass. XLA runs the same transform as a strided transpose +
# pad + quant chain at ~3.1 ms/tensor (whisper-small B=64); this kernel does
# the transpose in VMEM at 1.06 ms — x2.9, saving ~50 ms per headline batch
# across the 24 K/V tensors.
# ---------------------------------------------------------------------------

def _tq_kernel(x_ref, q_ref, s_ref, *, h: int, s_pad: int):
    x = x_ref[0].astype(jnp.float32)              # (S, D)
    x = jnp.pad(x, ((0, s_pad - x.shape[0]), (0, 0)))
    xt = x.T.reshape(h, x.shape[1] // h, s_pad)   # (H, Dh, S_pad)
    sc = jnp.maximum(jnp.abs(xt).max(axis=1, keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(xt / sc), -127, 127)
    q_ref[:] = q.astype(jnp.int8)
    s_ref[:] = sc.astype(jnp.float32)


# rough VMEM bytes per grid step: input bf16 + f32 copy + f32 transpose
_TQ_VMEM_BUDGET = 13 * 1024 * 1024


def transpose_quant_supported(s: int, d: int) -> bool:
    return pad_cross_len(s) * d * 10 <= _TQ_VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("h",))
def transpose_quant_kv(x: jax.Array, h: int) -> tuple[jax.Array, jax.Array]:
    """x (B, S, H·Dh) -> ((B·H, Dh, S_pad) int8, (B·H, 1, S_pad) f32)."""
    b, s, d = x.shape
    s_pad = pad_cross_len(s)
    dh = d // h
    return pl.pallas_call(
        functools.partial(_tq_kernel, h=h, s_pad=s_pad),
        out_shape=(jax.ShapeDtypeStruct((b * h, dh, s_pad), jnp.int8),
                   jax.ShapeDtypeStruct((b * h, 1, s_pad), jnp.float32)),
        grid=(b,),
        in_specs=[pl.BlockSpec((1, s, d), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(pl.BlockSpec((h, dh, s_pad), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((h, 1, s_pad), lambda i: (i, 0, 0),
                                memory_space=pltpu.VMEM)),
        cost_estimate=pl.CostEstimate(
            flops=3 * b * s_pad * d,
            bytes_accessed=b * s * d * x.dtype.itemsize
            + b * d * s_pad + b * h * 4 * s_pad,
            transcendentals=0),
        interpret=_interpret(),
    )(x)


# ---------------------------------------------------------------------------
# Grouped (beam-search) variant: `beam` q rows share one K/V entry, so K/V is
# streamed once per utterance instead of once per beam (the bandwidth win
# that makes beam-5 affordable; see models.whisper.grouped_cross_attention
# for the XLA reference).
# ---------------------------------------------------------------------------

def _beam_core(q, k, ks, v, vs, o_ref, s_valid: int):
    """q (G,K,Dh) f32, k/v (G,Dh,S) f32; ks/vs (G,1,S) f32 or None."""
    scores = jax.lax.dot_general(
        q, k, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (G, K, S)
    if ks is not None:
        scores = scores * ks[:, :, :]             # (G,1,S) broadcasts over K
    g, kq, s_pad = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, kq, s_pad), 2)
    scores = jnp.where(col < s_valid, scores, NEG_INF)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if vs is not None:
        p = p * vs[:, :, :]
    out = jax.lax.dot_general(
        p / l, v, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)       # (G, K, Dh)
    o_ref[:] = out.astype(o_ref.dtype)


def _kernel_beam(q_ref, k_ref, v_ref, o_ref, *, s_valid: int):
    _beam_core(q_ref[:].astype(jnp.float32), k_ref[:].astype(jnp.float32),
               None, v_ref[:].astype(jnp.float32), None, o_ref, s_valid)


def _kernel_beam_int8(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *,
                      s_valid: int):
    _beam_core(q_ref[:].astype(jnp.float32), k_ref[:].astype(jnp.float32),
               ks_ref[:].astype(jnp.float32), v_ref[:].astype(jnp.float32),
               vs_ref[:].astype(jnp.float32), o_ref, s_valid)


def _kernel_beam_int4(q_ref, k_ref, ks_ref, v_ref, vs_ref, o_ref, *,
                      s_valid: int):
    _beam_core(q_ref[:].astype(jnp.float32), _unpack4(k_ref[:]),
               ks_ref[:].astype(jnp.float32), _unpack4(v_ref[:]),
               vs_ref[:].astype(jnp.float32), o_ref, s_valid)


@functools.partial(jax.jit, static_argnames=("s_valid", "block_g"))
def decode_cross_attention_grouped(q: jax.Array, k_t: jax.Array,
                                   v_t: jax.Array,
                                   k_scale: jax.Array | None = None,
                                   v_scale: jax.Array | None = None,
                                   s_valid: int | None = None,
                                   block_g: int = 8) -> jax.Array:
    """Beam-grouped one-token cross-attention over transposed K/V.

    q: (BH, K, Dh) — K beams per (batch, head), pre-scaled by 1/sqrt(Dh).
    k_t/v_t: (BH, Dh, S_pad) bf16, or int8 with (BH, 1, S_pad) fp32 scales.
    Returns (BH, K, Dh) in q.dtype.
    """
    bh, kq, dh = q.shape
    s_pad = k_t.shape[2]
    s_valid = s_pad if s_valid is None else s_valid
    dh_store = k_t.shape[1]  # Dh, or Dh/2 for split-half packed int4
    g = _fit_block_g(block_g, bh, dh_store, s_pad, k_t.dtype)
    kv_spec = pl.BlockSpec((g, dh_store, s_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    sc_spec = pl.BlockSpec((g, 1, s_pad), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((g, kq, dh), lambda i: (i, 0, 0),
                          memory_space=pltpu.VMEM)
    if k_scale is None:
        kernel = functools.partial(_kernel_beam, s_valid=s_valid)
        operands = (q, k_t, v_t)
        in_specs = [q_spec, kv_spec, kv_spec]
    else:
        kern = _kernel_beam_int4 if dh_store == dh // 2 else _kernel_beam_int8
        kernel = functools.partial(kern, s_valid=s_valid)
        operands = (q, k_t, k_scale, v_t, v_scale)
        in_specs = [q_spec, kv_spec, sc_spec, kv_spec, sc_spec]

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((bh, kq, dh), q.dtype),
        grid=(bh // g,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((g, kq, dh), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * kq * s_pad * dh,
            bytes_accessed=bh * 2 * dh * s_pad * k_t.dtype.itemsize,
            transcendentals=bh * kq * s_pad),
        interpret=_interpret(),
    )(*operands)
