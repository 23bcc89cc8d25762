"""Fused Pallas decode-step self-attention over the static KV cache.

One decode step's self-attention is tiny math (B·H heads × ≤448 cache slots
× Dh=64) but, expressed in XLA, it is ~20 small ops per layer (mask build,
two einsums, fp32 softmax, cache reads, reshapes) whose fixed launch
overheads dominate: measured 1.42 ms of the 4.6 ms decode step at
whisper-small batch 64 (the role HF's fused SDPA plays inside
`model.generate`, reference `data_utils.py:152`).

This kernel fuses the masked attention into ONE call per layer:

    scores[g, s] = sum_d q[g, d] * K[g, s, d]      (s <= pos)
    p            = softmax(scores)
    out[g, d]    = sum_s p[g, s] * V[g, s, d]

The cache row write for position `pos` stays outside as an XLA in-place
`dynamic_update_slice` (donated buffer, writes one row) and MUST happen
before this kernel reads the cache — the caller passes the updated buffers.

Layout: caches are viewed (B·H, S, Dh) — a free leading-dim merge of the
(B, H, S, Dh) cache — with S on sublanes and Dh=64 on lanes. `pos` rides in
SMEM via PrefetchScalarGridSpec (dynamic *data* indexing by `pos` is
avoided entirely: masking handles it, so Mosaic's 8-multiple sublane-slice
restriction never applies).
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


def _fit_block_g(block_g: int, bh: int, s: int, dh: int, cache_dtype) -> int:
    """Largest (b·h) block that fits the fp-cache kernels' scoped-VMEM
    budget: k/v blocks double-buffered plus their fp32 working copies, with
    Dh LANE-PADDED to 128 (Mosaic tiles the minor dim to 128, so dh=64
    blocks occupy 2x their logical bytes). Calibrated on v5e: an f32 cache
    at g=128, s=64, dh=64 measured 18.04 MB scoped against the 16 MB limit
    (~4.3 bytes per logical element byte → the 5x factor); bf16 keeps the
    benched g=128 under the same bound."""
    g = block_g
    itemsize = jnp.dtype(cache_dtype).itemsize
    while g > 8 and g * s * max(dh, 128) * itemsize * 5 > 14 * 1024 * 1024:
        g //= 2
    while bh % g:
        g //= 2
    if g % 8 and g != bh:
        # Mosaic requires the block's second-to-last dim be a multiple of 8
        # OR equal to the array dim. bh % 8 != 0 (e.g. B=2, H=6 -> bh=12)
        # bottoms the halving out at an invalid 4/2/1 — use the full-array
        # block instead (always valid; also a single grid step, and bh this
        # shape can only be small-odd x {1,2,4} so VMEM fits).
        g = bh
    return g


def _core(pos_ref, q_ref, start_ref, kc_ref, vc_ref, ks_ref, vs_ref, o_ref):
    pos = pos_ref[0]
    q = q_ref[:].astype(jnp.float32)               # (G, Dh), pre-scaled
    kc = kc_ref[:].astype(jnp.float32)             # (G, S, Dh)
    scores = jax.lax.dot_general(                  # (G, S); batched dot
        q[:, None, :], kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
    if ks_ref is not None:                         # int8 cache: fold k scale
        scores = scores * ks_ref[:]                # (G, S), same layout

    g, s_pad = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, s_pad), 1)
    ok = col <= pos
    if start_ref is not None:
        ok = jnp.logical_and(ok, col >= start_ref[:])
    scores = jnp.where(ok, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    if vs_ref is not None:                         # fold v dequant scale
        p = p * vs_ref[:]
    vc = vc_ref[:].astype(jnp.float32)             # (G, S, Dh)
    out = jax.lax.dot_general(                     # (G, Dh); batched dot
        p[:, None, :], vc, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :] / l
    o_ref[:] = out.astype(o_ref.dtype)


def _kernel(pos_ref, q_ref, start_ref, kc_ref, vc_ref, o_ref):
    _core(pos_ref, q_ref, start_ref, kc_ref, vc_ref, None, None, o_ref)


def _kernel_nostart(pos_ref, q_ref, kc_ref, vc_ref, o_ref):
    _core(pos_ref, q_ref, None, kc_ref, vc_ref, None, None, o_ref)


def _kernel_upd(pos_ref, q_ref, k_ref, v_ref, start_ref, kc_ref, vc_ref,
                o_ref, krow_ref, vrow_ref):
    """Fused update+attend: caches are ALIASED in/out; this grid step's new
    row is written through a (g, 1, dh) output block whose sublane index is
    `pos` (scalar-prefetch index_map), and the attention substitutes the
    fresh row in-register (the fetched cache block still holds the stale
    row)."""
    pos = pos_ref[0]
    # k_ref/v_ref are (G, 1, Dh) so the row store below is 3D->3D (Mosaic
    # rejects the 2D->3D shape casts a (G, Dh) operand would need)
    k_new = k_ref[:, 0, :].astype(jnp.float32)     # (G, Dh)
    v_new = v_ref[:, 0, :].astype(jnp.float32)
    # write-back window: the 8-row aligned block containing `pos` (Mosaic
    # requires 8-multiple sublane blocks); stale neighbor rows are copied
    # back unchanged from the fetched cache, row `pos` gets the fresh value
    base = pl.multiple_of((pos // 8) * 8, 8)
    krow_ref[:] = kc_ref[:, pl.ds(base, 8), :]
    vrow_ref[:] = vc_ref[:, pl.ds(base, 8), :]
    for r in range(8):
        @pl.when(base + r == pos)
        def _write(r=r):
            krow_ref[:, r:r + 1, :] = k_ref[:].astype(krow_ref.dtype)
            vrow_ref[:, r:r + 1, :] = v_ref[:].astype(vrow_ref.dtype)

    q = q_ref[:].astype(jnp.float32)               # (G, Dh), pre-scaled
    kc = kc_ref[:].astype(jnp.float32)             # (G, S, Dh) stale @ pos
    # batched dot_general contractions lower ~30% faster on v5e than the
    # broadcast-reduce formulation (same finding as ops.cross_attention)
    scores = jax.lax.dot_general(
        q[:, None, :], kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]  # (G, S)
    s_new = jnp.sum(q * k_new, axis=1)             # (G,)

    g, s_pad = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, s_pad), 1)
    scores = jnp.where(col == pos, s_new[:, None], scores)
    ok = col <= pos
    if start_ref is not None:
        ok = jnp.logical_and(ok, col >= start_ref[:])
    scores = jnp.where(ok, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p_pos = jnp.exp(s_new[:, None] - m)            # (G, 1) fresh-row prob
    p = jnp.where(col == pos, 0.0, p)              # stale row contributes 0
    vc = vc_ref[:].astype(jnp.float32)
    out = (jax.lax.dot_general(
        p[:, None, :], vc, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
        + p_pos * v_new) / l                       # (G, Dh)
    o_ref[:] = out.astype(o_ref.dtype)


def _kernel_upd_nostart(pos_ref, q_ref, k_ref, v_ref, kc_ref, vc_ref,
                        o_ref, krow_ref, vrow_ref):
    _kernel_upd(pos_ref, q_ref, k_ref, v_ref, None, kc_ref, vc_ref,
                o_ref, krow_ref, vrow_ref)


def _kernel_upd_i8(pos_ref, q_ref, k_ref, v_ref, start_ref,
                   kc_ref, ks_ref, vc_ref, vs_ref,
                   o_ref, krow_ref, ksrow_ref, vrow_ref, vsrow_ref):
    """int8-cache variant of _kernel_upd: quantizes this step's row
    in-kernel (per-(g,pos) absmax scale), writes int8 row + scale through
    aliased blocks, and attends with per-position dequant folded into the
    score/probability vectors (matching cache.update + read).

    Scales are (G, S) — position on LANES, the same layout as the score
    vector they multiply, so the fold is a plain elementwise multiply and
    the blocks cost S*4 bytes per group row in VMEM (the previous (G, S, 1)
    layout lane-padded 64× and needed a sublane→lane relayout per block,
    which inverted kv_int8 vs bf16 on short caches — DESIGN §8). The scale
    write-back is a full-block where(col==pos): S*4*2 bytes per group row
    of extra write traffic, ~1.5% of the int8 cache stream."""
    pos = pos_ref[0]
    k_new = k_ref[:, 0, :].astype(jnp.float32)     # (G, Dh)
    v_new = v_ref[:, 0, :].astype(jnp.float32)
    ks_new = jnp.maximum(jnp.max(jnp.abs(k_new), axis=1, keepdims=True),
                         1e-12) / 127.0            # (G, 1)
    vs_new = jnp.maximum(jnp.max(jnp.abs(v_new), axis=1, keepdims=True),
                         1e-12) / 127.0
    kq_new = jnp.clip(jnp.round(k_new / ks_new), -127, 127)   # (G, Dh)
    vq_new = jnp.clip(jnp.round(v_new / vs_new), -127, 127)

    base = pl.multiple_of((pos // 8) * 8, 8)
    krow_ref[:] = kc_ref[:, pl.ds(base, 8), :]
    vrow_ref[:] = vc_ref[:, pl.ds(base, 8), :]
    for r in range(8):
        @pl.when(base + r == pos)
        def _write(r=r):
            krow_ref[:, r:r + 1, :] = kq_new[:, None, :].astype(
                krow_ref.dtype)
            vrow_ref[:, r:r + 1, :] = vq_new[:, None, :].astype(
                vrow_ref.dtype)

    q = q_ref[:].astype(jnp.float32)               # (G, Dh)
    kc = kc_ref[:].astype(jnp.float32)             # (G, S, Dh) int8 stale
    scores = jax.lax.dot_general(
        q[:, None, :], kc, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]  # (G, S)
    scores = scores * ks_ref[:]                    # stale per-pos scales
    # fresh row attends at its quantized-then-dequantized value (XLA parity)
    s_new = jnp.sum(q * (kq_new * ks_new), axis=1)

    g, s_pad = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (g, s_pad), 1)
    # scale write-back: whole (G, S) block with the fresh scale at `pos`
    ksrow_ref[:] = jnp.where(col == pos, ks_new, ks_ref[:])
    vsrow_ref[:] = jnp.where(col == pos, vs_new, vs_ref[:])
    scores = jnp.where(col == pos, s_new[:, None], scores)
    ok = col <= pos
    if start_ref is not None:
        ok = jnp.logical_and(ok, col >= start_ref[:])
    scores = jnp.where(ok, scores, NEG_INF)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    p_pos = jnp.exp(s_new[:, None] - m)            # (G, 1)
    p = jnp.where(col == pos, 0.0, p)
    p = p * vs_ref[:]                              # fold stale v scales
    vc = vc_ref[:].astype(jnp.float32)
    v_deq_new = vq_new * vs_new
    out = (jax.lax.dot_general(
        p[:, None, :], vc, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)[:, 0, :]
        + p_pos * v_deq_new) / l
    o_ref[:] = out.astype(o_ref.dtype)


def _kernel_upd_i8_nostart(pos_ref, q_ref, k_ref, v_ref,
                           kc_ref, ks_ref, vc_ref, vs_ref,
                           o_ref, krow_ref, ksrow_ref, vrow_ref, vsrow_ref):
    _kernel_upd_i8(pos_ref, q_ref, k_ref, v_ref, None,
                   kc_ref, ks_ref, vc_ref, vs_ref,
                   o_ref, krow_ref, ksrow_ref, vrow_ref, vsrow_ref)


@functools.partial(jax.jit, static_argnames=("block_g",),
                   donate_argnums=(3, 4))
def decode_self_attention_update(q: jax.Array, k_new: jax.Array,
                                 v_new: jax.Array,
                                 k_cache: jax.Array, v_cache: jax.Array,
                                 pos: jax.Array,
                                 start: jax.Array | None = None,
                                 block_g: int = 256
                                 ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Fused cache-row update + masked decode-step self-attention.

    Like `decode_self_attention` but the caches come in STALE at `pos`:
    the kernel writes k_new/v_new into row `pos` (caches aliased in/out,
    only the row travels) and attends with the fresh row substituted
    in-register. Replaces the XLA `dynamic_update_slice` pair per layer,
    which the while-loop scheduler was materializing as full-cache copies
    (~13 µs × 24/step at whisper-small batch 64 — measured via profiler).

    q/k_new/v_new: (BH, Dh) — q pre-scaled. k_cache/v_cache: (BH, S, Dh),
    donated. Returns (out (BH, Dh), k_cache', v_cache')."""
    bh, dh = q.shape
    s = k_cache.shape[1]
    g = _fit_block_g(block_g, bh, s, dh, k_cache.dtype)

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    row = pl.BlockSpec((g, dh), lambda i, sp: (i, 0), memory_space=pltpu.VMEM)
    row3 = pl.BlockSpec((g, 1, dh), lambda i, sp: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    cache = pl.BlockSpec((g, s, dh), lambda i, sp: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    cache_row = pl.BlockSpec((g, 8, dh), lambda i, sp: (i, sp[0] // 8, 0),
                             memory_space=pltpu.VMEM)
    in_specs = [row, row3, row3]
    operands = [q, k_new.reshape(bh, 1, dh), v_new.reshape(bh, 1, dh)]
    kernel = _kernel_upd_nostart
    if start is not None:
        in_specs.append(pl.BlockSpec((g, 1), lambda i, sp: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(start.astype(jnp.int32).reshape(bh, 1))
        kernel = _kernel_upd
    in_specs += [cache, cache]
    operands += [k_cache, v_cache]
    n_in = len(operands)  # + 1 scalar-prefetch arg at index 0

    out, kc, vc = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // g,),
            in_specs=in_specs,
            out_specs=(row, cache_row, cache_row),
        ),
        out_shape=(jax.ShapeDtypeStruct((bh, dh), q.dtype),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype)),
        # alias caches: operand indices count the scalar-prefetch arg
        input_output_aliases={n_in - 1: 1, n_in: 2},
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * dh,
            bytes_accessed=2 * bh * s * dh * k_cache.dtype.itemsize,
            transcendentals=bh * s),
        interpret=_interpret(),
    )(pos_arr, *operands)
    return out, kc, vc


def _kernel_int8(pos_ref, q_ref, start_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                 o_ref):
    _core(pos_ref, q_ref, start_ref, kc_ref, vc_ref, ks_ref, vs_ref, o_ref)


def _kernel_int8_nostart(pos_ref, q_ref, kc_ref, ks_ref, vc_ref, vs_ref,
                         o_ref):
    _core(pos_ref, q_ref, None, kc_ref, vc_ref, ks_ref, vs_ref, o_ref)


@functools.partial(jax.jit, static_argnames=("block_g",))
def decode_self_attention(q: jax.Array,
                          k_cache: jax.Array, v_cache: jax.Array,
                          pos: jax.Array,
                          start: jax.Array | None = None,
                          k_scale: jax.Array | None = None,
                          v_scale: jax.Array | None = None,
                          block_g: int = 256) -> jax.Array:
    """Fused masked decode-step self-attention.

    q: (BH, Dh) — pre-scaled by Dh**-0.5.
    k_cache/v_cache: (BH, S, Dh) — row `pos` must already hold this step's
    key/value (write it with `cache.update` before calling). int8 caches
    pass per-position absmax scales k_scale/v_scale (BH, S) fp32 — position
    on LANES, matching the score layout — and the dequant folds into the
    score/probability vectors.
    pos: scalar int32 position to attend up to (inclusive).
    start: optional (BH,) int32 first valid position (left-padded prompts).

    Returns out (BH, Dh) in q.dtype.
    """
    bh, dh = q.shape
    s = k_cache.shape[1]
    g = _fit_block_g(block_g, bh, s, dh, k_cache.dtype)

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    row = pl.BlockSpec((g, dh), lambda i, sp: (i, 0), memory_space=pltpu.VMEM)
    cache = pl.BlockSpec((g, s, dh), lambda i, sp: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    scale = pl.BlockSpec((g, s), lambda i, sp: (i, 0),
                         memory_space=pltpu.VMEM)
    int8 = k_scale is not None
    in_specs = [row]
    operands = [q]
    kernel = _kernel_int8_nostart if int8 else _kernel_nostart
    if start is not None:
        in_specs.append(pl.BlockSpec((g, 1), lambda i, sp: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(start.astype(jnp.int32).reshape(bh, 1))
        kernel = _kernel_int8 if int8 else _kernel
    if int8:
        in_specs += [cache, scale, cache, scale]
        operands += [k_cache, k_scale.astype(jnp.float32),
                     v_cache, v_scale.astype(jnp.float32)]
    else:
        in_specs += [cache, cache]
        operands += [k_cache, v_cache]

    return pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // g,),
            in_specs=in_specs,
            out_specs=row,
        ),
        out_shape=jax.ShapeDtypeStruct((bh, dh), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * dh,
            bytes_accessed=2 * bh * s * dh * k_cache.dtype.itemsize,
            transcendentals=bh * s),
        interpret=_interpret(),
    )(pos_arr, *operands)


@functools.partial(jax.jit, static_argnames=("block_g",),
                   donate_argnums=(3, 4, 5, 6))
def decode_self_attention_update_int8(q: jax.Array, k_new: jax.Array,
                                      v_new: jax.Array,
                                      k_cache: jax.Array, v_cache: jax.Array,
                                      k_scale: jax.Array, v_scale: jax.Array,
                                      pos: jax.Array,
                                      start: jax.Array | None = None,
                                      block_g: int = 256):
    """int8-cache fused row-quantize + update + attend (see _kernel_upd_i8).

    k_cache/v_cache: (BH, S, Dh) int8; k_scale/v_scale: (BH, S) f32
    per-position absmax scales, position on LANES — all four donated/aliased.
    Returns (out (BH, Dh), k_cache', v_cache', k_scale', v_scale')."""
    bh, dh = q.shape
    s = k_cache.shape[1]
    g = block_g
    # int8 cache blocks lane-pad Dh=64 -> 128 (x2 for double buffering) plus
    # their f32 in-kernel working copies; the lane-major (g, s) scale blocks
    # are now noise (s*4 B per group row). Calibrated alongside the fp
    # kernels' 5x rule: int8 bytes x (2 buffered + 4 f32 copy) x 2 lane pad.
    while g > 8 and g * s * max(dh, 128) * 12 > 14 * 1024 * 1024:
        g //= 2
    while bh % g:
        g //= 2
    if g % 8 and g != bh:
        # Mosaic sublane fallback (same argument as _fit_block_g): only
        # reachable when bh has 2-adic valuation < 3, i.e. bh is a small
        # odd multiple of 1/2/4 — but unlike the fp path this was
        # unguarded against re-inflating past the VMEM budget the halving
        # loop enforced (ADVICE r4 #2), so re-check the bound explicitly.
        g = bh
        assert g * s * max(dh, 128) * 12 <= 14 * 1024 * 1024, (
            f"decode_self_attention_update_int8: bh={bh} (2-adic valuation "
            f"< 3) forces a full-array block over the 14 MB scoped-VMEM "
            f"budget at s={s}, dh={dh}; pad bh to a multiple of 8")

    pos_arr = jnp.asarray(pos, jnp.int32).reshape(1)
    row = pl.BlockSpec((g, dh), lambda i, sp: (i, 0), memory_space=pltpu.VMEM)
    row3 = pl.BlockSpec((g, 1, dh), lambda i, sp: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    cache = pl.BlockSpec((g, s, dh), lambda i, sp: (i, 0, 0),
                         memory_space=pltpu.VMEM)
    scale = pl.BlockSpec((g, s), lambda i, sp: (i, 0),
                         memory_space=pltpu.VMEM)
    cache_row = pl.BlockSpec((g, 8, dh), lambda i, sp: (i, sp[0] // 8, 0),
                             memory_space=pltpu.VMEM)
    scale_row = scale
    in_specs = [row, row3, row3]
    operands = [q, k_new.reshape(bh, 1, dh), v_new.reshape(bh, 1, dh)]
    kernel = _kernel_upd_i8_nostart
    if start is not None:
        in_specs.append(pl.BlockSpec((g, 1), lambda i, sp: (i, 0),
                                     memory_space=pltpu.VMEM))
        operands.append(start.astype(jnp.int32).reshape(bh, 1))
        kernel = _kernel_upd_i8
    in_specs += [cache, scale, cache, scale]
    operands += [k_cache, k_scale.astype(jnp.float32),
                 v_cache, v_scale.astype(jnp.float32)]
    n_in = len(operands)  # +1 scalar-prefetch arg at index 0

    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bh // g,),
            in_specs=in_specs,
            out_specs=(row, cache_row, scale_row, cache_row, scale_row),
        ),
        out_shape=(jax.ShapeDtypeStruct((bh, dh), q.dtype),
                   jax.ShapeDtypeStruct(k_cache.shape, k_cache.dtype),
                   jax.ShapeDtypeStruct(k_scale.shape, jnp.float32),
                   jax.ShapeDtypeStruct(v_cache.shape, v_cache.dtype),
                   jax.ShapeDtypeStruct(v_scale.shape, jnp.float32)),
        # aliases count the scalar-prefetch arg: kc, ks, vc, vs -> outs 1..4
        input_output_aliases={n_in - 3: 1, n_in - 2: 2,
                              n_in - 1: 3, n_in: 4},
        cost_estimate=pl.CostEstimate(
            flops=4 * bh * s * dh,
            bytes_accessed=2 * bh * s * dh,
            transcendentals=bh * s),
        interpret=_interpret(),
    )(pos_arr, *operands)
    return out
