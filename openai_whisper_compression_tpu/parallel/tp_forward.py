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


def _local_attn(p: dict, x: jax.Array, head_dim: int, axis: str) -> jax.Array:
    """Self-attention over the LOCAL head shard; psum after the row-parallel
    out projection, bias added once post-reduction."""
    local_out = p["q"]["w"].shape[1] if not isinstance(p["q"]["w"], QTensor) \
        else p["q"]["w"].shape[1]
    h = local_out // head_dim
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


def tp_compatible(params: Any, mesh: Mesh) -> Any:
    """Convert QTensors whose packed layout can't shard under TP into dense
    leaves: sub-byte kinds pack along K (split-half), so ROW-parallel weights
    (o, fc2 — spec ('tp', None)) would shard across the packing interleave.
    Column-parallel sub-byte weights stay packed (N sharding is layout-safe).
    """
    from ..ops.qtensor import dequantize

    specs = mesh_lib.param_specs(params)

    def fix(leaf, spec):
        if isinstance(leaf, QTensor) and leaf.kind in SUB_BYTE:
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
            elif leaf.kind == "group_asym":
                d_spec, s_spec = P(k_ax, n_ax), P(k_ax, n_ax)
            else:
                d_spec, s_spec = P(), P()
            return dataclasses.replace(
                leaf, data=d_spec, scale=s_spec,
                zero=None if leaf.zero is None else s_spec,
                scale2=None if leaf.scale2 is None else P(),
                offset2=None if leaf.offset2 is None else P(),
                act_scale=None if leaf.act_scale is None else P())
        return spec

    return jax.tree.map(expand, params, specs,
                        is_leaf=lambda x: isinstance(x, QTensor))


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
