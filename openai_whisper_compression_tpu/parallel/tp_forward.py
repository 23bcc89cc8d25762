"""Explicit tensor-parallel forward via shard_map.

GSPMD cannot partition Pallas custom calls, so the quantized kernels force a
replicated fallback under pjit-style TP. This module runs the forward inside
`shard_map` instead: every device sees its *local* head/FFN shard as a plain
array, the unchanged single-device primitives (including the Pallas int8/int4
kernels) run shard-locally, and the two Megatron reduction points are
explicit `psum`s. Row-parallel biases (o, fc2) are applied after the psum.

Layout (matches parallel.mesh.param_specs):
  q/k/v: column-parallel (local heads)      -> no comm
  o:     row-parallel                       -> psum, then + bias
  fc1:   column-parallel                    -> no comm
  fc2:   row-parallel                       -> psum, then + bias
  conv/LN/embeddings: replicated
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..config import WhisperArch
from ..models.whisper import (attention, gelu, layer_norm, split_heads,
                              merge_heads, _conv1d)
from ..ops.linear import linear
from ..ops.qtensor import QTensor
from . import mesh as mesh_lib


# Width of a (possibly shard-local) weight: QTensor static `shape` is global
# metadata, so widths must come from the data arrays (models.whisper._out_width).
from ..models.whisper import _out_width as _local_width  # noqa: E402

def _local_attn(p: dict, x: jax.Array, head_dim: int, axis: str) -> jax.Array:
    """Self-attention over the LOCAL head shard; psum after the row-parallel
    out projection, bias added once post-reduction."""
    h = _local_width(p["q"]["w"]) // head_dim
    q = split_heads(linear(x, p["q"]["w"], p["q"].get("b")), h)
    k = split_heads(linear(x, p["k"]["w"]), h)
    v = split_heads(linear(x, p["v"]["w"], p["v"].get("b")), h)
    o = linear(merge_heads(attention(q, k, v)), p["o"]["w"])  # no bias yet
    o = jax.lax.psum(o, axis)
    b = p["o"].get("b")
    return o + b.astype(o.dtype) if b is not None else o


def _local_mlp(p: dict, x: jax.Array, axis: str) -> jax.Array:
    h = gelu(linear(x, p["fc1"]["w"], p["fc1"].get("b")))
    y = linear(h, p["fc2"]["w"])
    y = jax.lax.psum(y, axis)
    b = p["fc2"].get("b")
    return y + b.astype(y.dtype) if b is not None else y


def _encode_local(params: Any, mel: jax.Array, arch: WhisperArch,
                  axis: str) -> jax.Array:
    enc = params["encoder"]
    x = gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], stride=1))
    x = gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2))
    x = x.transpose(0, 2, 1)
    x = x + enc["pos"][: x.shape[1]].astype(x.dtype)
    for layer in enc["layers"]:
        x = x + _local_attn(layer["attn"], layer_norm(x, layer["attn_ln"]),
                            arch.head_dim, axis)
        x = x + _local_mlp(layer, layer_norm(x, layer["mlp_ln"]), axis)
    return layer_norm(x, enc["ln"])


SUB_BYTE = ("int4_pack", "int2_pack", "nf4", "fp4")


def _packed_along_k(leaf: QTensor) -> bool:
    """True when the data array packs sub-byte values split-half along K
    (int4/int2/nf4/fp4 always; group_asym when bits <= 4)."""
    return (leaf.kind in SUB_BYTE
            or (leaf.kind == "group_asym"
                and leaf.data.shape[0] != leaf.in_dim))


def tp_compatible(params: Any, mesh: Mesh) -> Any:
    """Convert QTensors whose packed layout can't shard under TP into dense
    leaves: sub-byte kinds pack along K (split-half), so ROW-parallel weights
    (o, fc2 — spec ('tp', None)) would shard across the packing interleave.
    Column-parallel sub-byte weights stay packed (N sharding is layout-safe).
    """
    from ..ops.qtensor import dequantize

    specs = mesh_lib.param_specs(params)

    def fix(leaf, spec):
        if isinstance(leaf, QTensor) and _packed_along_k(leaf):
            parts = tuple(spec) + (None, None)
            if parts[0] is not None:  # row-parallel -> dense
                return dequantize(leaf, jnp.float32)
        return leaf

    return jax.tree.map(fix, params, specs,
                        is_leaf=lambda x: isinstance(x, QTensor))


def _spec_tree(params: Any, mesh: Mesh):
    """Per-array-field PartitionSpec pytree matching `params` (QTensor leaves
    expand to per-field specs so shard_map's flattening lines up)."""
    import dataclasses

    specs = mesh_lib.param_specs(params)

    def expand(leaf, spec):
        if isinstance(leaf, QTensor):
            parts = tuple(spec) + (None, None)
            k_ax, n_ax = parts[0], parts[1]
            if leaf.kind in ("int8_pc", "fp8", "int4_pack", "int2_pack"):
                d_spec, s_spec = P(k_ax, n_ax), P(None, n_ax)
            else:  # group_asym / nf4 / fp4: per-group params (K/G, N)
                d_spec, s_spec = P(k_ax, n_ax), P(k_ax, n_ax)
            return dataclasses.replace(
                leaf, data=d_spec, scale=s_spec,
                zero=None if leaf.zero is None else s_spec,
                scale2=None if leaf.scale2 is None else s_spec,
                offset2=None if leaf.offset2 is None else s_spec,
                act_scale=None if leaf.act_scale is None else P())
        return spec

    return jax.tree.map(expand, params, specs,
                        is_leaf=lambda x: isinstance(x, QTensor))


# ---------------------------------------------------------------------------
# Tensor-parallel greedy decode (serving path for whisper-large over a slice)
# ---------------------------------------------------------------------------

def _local_cross_kv(params: Any, arch: WhisperArch, enc_out: jax.Array):
    """Per-layer transposed CrossKV from the LOCAL column-parallel k/v
    projections: each shard holds its own heads' (B·H/tp, Dh, S_pad), in
    the fused-kernel layout (the Pallas decode cross-attention runs
    shard-locally under shard_map — models.whisper.cross_t_apply)."""
    from ..models.whisper import CrossKV, _transpose_kv

    s = enc_out.shape[1]
    kvs = []
    for layer in params["decoder"]["layers"]:
        p = layer["cross"]
        h = _local_width(p["k"]["w"]) // arch.head_dim
        k_t = _transpose_kv(linear(enc_out, p["k"]["w"]), h)
        v_t = _transpose_kv(linear(enc_out, p["v"]["w"], p["v"].get("b")), h)
        kvs.append(CrossKV(k_t.astype(enc_out.dtype),
                           v_t.astype(enc_out.dtype), s_valid=s))
    return kvs


def _decoder_step_local(params: Any, arch: WhisperArch, tok: jax.Array,
                        pos: jax.Array, cache: list, cross_kvs: list,
                        max_len: int, axis: str):
    """models.decode.decoder_step with Megatron psum points: q/k/v and the
    self/cross KV caches live on local head shards; o and fc2 outputs are
    all-reduced (bias post-reduction). Logits computed redundantly per shard
    (embed replicated) so argmax agrees everywhere."""
    from ..models import cache as kv_cache
    from ..models.whisper import embed_tokens, project_out

    dec = params["decoder"]
    x = embed_tokens(dec, tok)[:, None, :]
    x = x + jax.lax.dynamic_slice_in_dim(dec["pos"], pos, 1,
                                         axis=0)[None].astype(x.dtype)
    idx = jnp.arange(max_len)
    mask = jnp.where(idx <= pos, 0.0, -1e9).astype(jnp.float32)[None, None, None, :]

    new_cache = []
    for i, layer in enumerate(dec["layers"]):
        p = layer["attn"]
        h = _local_width(p["q"]["w"]) // arch.head_dim
        hs = layer_norm(x, layer["attn_ln"])
        q = split_heads(linear(hs, p["q"]["w"], p["q"].get("b")), h)
        k = split_heads(linear(hs, p["k"]["w"]), h)
        v = split_heads(linear(hs, p["v"]["w"], p["v"].get("b")), h)
        entry = kv_cache.update(cache[i], k, v, pos)
        new_cache.append(entry)
        k_all, v_all = kv_cache.read(entry, q.dtype)
        o = linear(merge_heads(attention(q, k_all, v_all, mask)), p["o"]["w"])
        o = jax.lax.psum(o, axis)
        ob = p["o"].get("b")
        x = x + (o + ob.astype(o.dtype) if ob is not None else o)

        c = layer["cross"]
        hc = layer_norm(x, layer["cross_ln"])
        hq = _local_width(c["q"]["w"]) // arch.head_dim
        dh = arch.head_dim
        from ..models.whisper import cross_t_apply

        cq = linear(hc, c["q"]["w"], c["q"].get("b"))      # (B, 1, Hloc*Dh)
        qf = (cq.reshape(-1, dh) * (dh ** -0.5)).astype(cq.dtype)
        co = cross_t_apply(qf, cross_kvs[i])
        co = co.reshape(cq.shape[0], 1, hq * dh).astype(hc.dtype)
        co = linear(co, c["o"]["w"])                       # bias post-psum
        co = jax.lax.psum(co, axis)
        cb = c["o"].get("b")
        x = x + (co + cb.astype(co.dtype) if cb is not None else co)

        x = x + _local_mlp(layer, layer_norm(x, layer["mlp_ln"]), axis)

    x = layer_norm(x, dec["ln"])
    return project_out(dec, x)[:, 0, :], new_cache


def _greedy_local(params: Any, mel: jax.Array, arch: WhisperArch, axis: str,
                  cfg) -> tuple[jax.Array, jax.Array]:
    from jax import lax

    from ..models import cache as kv_cache
    from ..models.decode import _gen_lengths, _suppress_bias, forced_prefix

    enc_out = _encode_local(params, mel, arch, axis)
    b = enc_out.shape[0]
    eot = arch.eos_token_id
    prefix = forced_prefix(arch, cfg)
    p_len = len(prefix)
    need = p_len + cfg.max_new_tokens + 1
    max_len = min(arch.max_target_positions, -(-need // 64) * 64)
    sup = jnp.asarray(_suppress_bias(arch, tuple(cfg.suppress_tokens)))

    cross_kvs = _local_cross_kv(params, arch, enc_out)
    cache = kv_cache.init_cache(params, arch, b, max_len, dtype=enc_out.dtype)
    tokens = jnp.full((b, max_len), eot, jnp.int32)
    tokens = tokens.at[:, :p_len].set(jnp.asarray(prefix, jnp.int32)[None])

    for i in range(p_len - 1):
        _, cache = _decoder_step_local(params, arch, tokens[:, i],
                                       jnp.asarray(i), cache, cross_kvs,
                                       max_len, axis)
    limit = min(max_len, p_len + cfg.max_new_tokens)

    def cond(state):
        _, _, pos, finished = state
        return jnp.logical_and(pos < limit - 1, ~jnp.all(finished))

    def body(state):
        tokens, cache, pos, finished = state
        logits, cache = _decoder_step_local(params, arch, tokens[:, pos],
                                            pos, cache, cross_kvs, max_len,
                                            axis)
        nxt = jnp.argmax(logits + sup, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eot, nxt)
        tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        return tokens, cache, pos + 1, jnp.logical_or(finished, nxt == eot)

    # shard_map vma typing: loop outputs are device-varying, so the
    # constant-initialized carry must be cast to varying up front
    tokens = jax.lax.pcast(tokens, ("dp",), to="varying")
    finished = jax.lax.pcast(jnp.zeros((b,), bool), ("dp",), to="varying")
    cache = jax.tree.map(
        lambda x: jax.lax.pcast(x, ("tp", "dp"), to="varying"), cache)
    state = (tokens, cache, jnp.asarray(p_len - 1), finished)
    tokens, _, pos, _ = lax.while_loop(cond, body, state)
    return tokens, p_len + _gen_lengths(tokens, p_len, pos, eot)


def make_tp_decoder(arch: WhisperArch, mesh: Mesh, params_template: Any,
                    decode_cfg) -> tuple:
    """(decode_fn, place_params): full TP transcription step — encoder + KV
    cross-precompute + greedy while_loop, all inside one shard_map (caches
    and cross-KV sharded over local heads, logits redundantly replicated)."""
    template = tp_compatible(params_template, mesh)
    pspecs = _spec_tree(template, mesh)

    fn = shard_map(
        partial(_greedy_local, arch=arch, axis="tp", cfg=decode_cfg),
        mesh=mesh,
        in_specs=(pspecs, P("dp")),
        out_specs=(P("dp"), P("dp")),
    )

    def place_params(params):
        return mesh_lib.shard_params(tp_compatible(params, mesh), mesh)

    return jax.jit(fn), place_params


# ---------------------------------------------------------------------------
# Megatron-style sequence parallelism (SP) on top of TP: between the
# attention/FFN blocks, activations (layernorms, residual stream) live
# SHARDED along the sequence dim on the same 'tp' group — T/tp activation
# memory per device at the same communication volume as plain TP (each
# psum splits into an all_gather before the block and a psum_scatter after).
# New component with no reference counterpart (SURVEY.md §2c); Whisper's
# fixed 1500-frame context makes ring/Ulysses CP unnecessary, but Megatron
# SP still cuts encoder activation memory for large batches.
# ---------------------------------------------------------------------------

def _local_attn_sp(p: dict, x_shard: jax.Array, head_dim: int,
                   axis: str) -> jax.Array:
    """x_shard: (B, T/tp, d) post-LN shard -> (B, T/tp, d) attention output
    shard. all_gather(T) -> local-head attention over full T -> row-parallel
    o-proj partials -> psum_scatter(T)."""
    x = jax.lax.all_gather(x_shard, axis, axis=1, tiled=True)  # (B, T, d)
    h = _local_width(p["q"]["w"]) // head_dim
    q = split_heads(linear(x, p["q"]["w"], p["q"].get("b")), h)
    k = split_heads(linear(x, p["k"]["w"]), h)
    v = split_heads(linear(x, p["v"]["w"], p["v"].get("b")), h)
    o = linear(merge_heads(attention(q, k, v)), p["o"]["w"])  # partial sums
    o = jax.lax.psum_scatter(o, axis, scatter_dimension=1, tiled=True)
    b = p["o"].get("b")
    return o + b.astype(o.dtype) if b is not None else o


def _local_mlp_sp(p: dict, x_shard: jax.Array, axis: str) -> jax.Array:
    x = jax.lax.all_gather(x_shard, axis, axis=1, tiled=True)
    h = gelu(linear(x, p["fc1"]["w"], p["fc1"].get("b")))
    y = linear(h, p["fc2"]["w"])  # row-parallel partials
    y = jax.lax.psum_scatter(y, axis, scatter_dimension=1, tiled=True)
    b = p["fc2"].get("b")
    return y + b.astype(y.dtype) if b is not None else y


def _encode_local_sp(params: Any, mel: jax.Array, arch: WhisperArch,
                     axis: str) -> jax.Array:
    """Shard-local SP+TP encoder body: conv stem replicated, then the
    residual stream stays T-sharded between blocks."""
    enc = params["encoder"]
    x = gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], stride=1))
    x = gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2))
    x = x.transpose(0, 2, 1)
    x = x + enc["pos"][: x.shape[1]].astype(x.dtype)
    # scatter the sequence: each device keeps its T/tp slice
    tp = jax.lax.axis_size(axis)
    t_local = x.shape[1] // tp
    i = jax.lax.axis_index(axis)
    x = jax.lax.dynamic_slice_in_dim(x, i * t_local, t_local, axis=1)
    # (slicing by axis_index already makes x device-varying on `axis`)
    for layer in enc["layers"]:
        x = x + _local_attn_sp(layer["attn"], layer_norm(x, layer["attn_ln"]),
                               arch.head_dim, axis)
        x = x + _local_mlp_sp(layer, layer_norm(x, layer["mlp_ln"]), axis)
    # LN is per-token: exact on the T-shard. The out_spec reassembles the
    # full sequence from the shards — no final gather needed.
    return layer_norm(x, enc["ln"])


def make_tp_sp_encoder(arch: WhisperArch, mesh: Mesh, params_template: Any):
    """(encode_fn, place_params) for the sequence-parallel TP encoder.
    Requires T (post-conv) divisible by the tp axis size."""
    template = tp_compatible(params_template, mesh)
    pspecs = _spec_tree(template, mesh)

    fn = shard_map(
        partial(_encode_local_sp, arch=arch, axis="tp"),
        mesh=mesh,
        in_specs=(pspecs, P("dp")),
        out_specs=P("dp", "tp"),  # (B, T, d): batch over dp, seq over tp
    )

    def place_params(params):
        return mesh_lib.shard_params(tp_compatible(params, mesh), mesh)

    return jax.jit(fn), place_params


def make_tp_encoder(arch: WhisperArch, mesh: Mesh, params_template: Any):
    """Build (encode_fn, place_params): an explicit-TP encoder whose local
    computation is the standard single-device code (Pallas kernels included).

    `params_template` provides the pytree structure for spec construction;
    place_params shards real params onto the mesh.
    """
    template = tp_compatible(params_template, mesh)
    pspecs = _spec_tree(template, mesh)

    fn = shard_map(
        partial(_encode_local, arch=arch, axis="tp"),
        mesh=mesh,
        in_specs=(pspecs, P("dp")),
        out_specs=P("dp"),
    )

    def place_params(params):
        return mesh_lib.shard_params(tp_compatible(params, mesh), mesh)

    return jax.jit(fn), place_params
