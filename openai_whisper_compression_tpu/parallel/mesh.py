"""Device mesh construction and sharding rules (data parallel + tensor
parallel over ICI).

New first-class subsystem with no reference counterpart (the reference is
single-device, SURVEY.md §2c): evaluation throughput scales by sharding the
utterance batch over 'dp', and whisper-large fits by sharding attention
heads / FFN over 'tp'. XLA GSPMD inserts all collectives; nothing here
issues communication by hand.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1,
              devices: list | None = None) -> Mesh:
    """('dp', 'tp') mesh. dp defaults to n_devices // tp."""
    devices = devices or jax.devices()
    n = len(devices)
    if dp is None:
        dp = n // tp
    assert dp * tp == n, f"dp({dp}) * tp({tp}) != devices({n})"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, axis_names=("dp", "tp"))


def choose_tp(n_devices: int, n_heads: int, ffn_dim: int) -> int:
    """Largest tensor-parallel degree dividing both device count and the
    shardable dims (attention heads, FFN width)."""
    tp = math.gcd(n_devices, n_heads)
    while tp > 1 and (ffn_dim % tp or n_devices % tp):
        tp -= 1
    return max(tp, 1)


# ---------------------------------------------------------------------------
# Parameter sharding rules (Megatron-style TP for attention + FFN)
# ---------------------------------------------------------------------------

def _attn_spec(attn: dict | None = None) -> dict[str, Any]:
    # q/k/v: split output (head) dim; o: split input dim -> psum after
    col = {"w": P(None, "tp"), "b": P("tp")}
    col_nb = {"w": P(None, "tp")}
    row = {"w": P("tp", None), "b": P(None)}
    if attn is not None and "qkv" in attn:
        # fused qkv concatenates head blocks of q|k|v: sharding the fused out
        # dim would split across the q/k/v boundary -> replicate fused layers
        return {"qkv": {"w": P(None, None), "b": P(None)}, "o": row}
    return {"q": col, "k": col_nb, "v": col, "o": row}


def _ln_spec() -> dict[str, Any]:
    return {"g": P(None), "b": P(None)}


def param_specs(params: dict) -> dict:
    """PartitionSpec pytree matching the parameter pytree."""
    def enc_layer(layer):
        return {
            "attn": _attn_spec(layer["attn"]), "attn_ln": _ln_spec(),
            "fc1": {"w": P(None, "tp"), "b": P("tp")},
            "fc2": {"w": P("tp", None), "b": P(None)},
            "mlp_ln": _ln_spec(),
        }

    def dec_layer(layer):
        p = enc_layer(layer)
        p["cross"] = _attn_spec(layer["cross"])
        p["cross_ln"] = _ln_spec()
        return p

    enc = params["encoder"]
    dec = params["decoder"]
    return {
        "encoder": {
            "conv1": {"w": P(None), "b": P(None)},
            "conv2": {"w": P(None), "b": P(None)},
            "pos": P(None),
            "layers": [enc_layer(l) for l in enc["layers"]],
            "ln": _ln_spec(),
        },
        "decoder": {
            "embed": P(None),
            "pos": P(None),
            "layers": [dec_layer(l) for l in dec["layers"]],
            "ln": _ln_spec(),
        },
    }


def _shard_qtensor(q, spec: P, mesh: Mesh):
    """Shard a QTensor's fields consistently with the dense weight's spec
    (data follows the logical (K, N) layout; per-channel scales follow N;
    group scales/zeros — incl. nf4/fp4 block scales, column-K layout —
    follow (K/G, N))."""
    import dataclasses

    def put(x, s):
        return None if x is None else jax.device_put(x, NamedSharding(mesh, s))

    parts = tuple(spec) + (None, None)
    k_ax, n_ax = parts[0], parts[1]
    data = put(q.data, P(k_ax, n_ax))
    if q.kind in ("int8_pc", "fp8", "int4_pack", "int2_pack"):
        scale = put(q.scale, P(None, n_ax))
        grp = P()
    else:  # group_asym / nf4 / fp4: per-group params along (K/G, N)
        scale = put(q.scale, P(k_ax, n_ax))
        grp = P(k_ax, n_ax)
    return dataclasses.replace(
        q, data=data, scale=scale,
        zero=put(q.zero, grp),
        scale2=put(q.scale2, grp), offset2=put(q.offset2, grp),
        act_scale=put(q.act_scale, P()))


def shard_params(params: dict, mesh: Mesh) -> dict:
    """Place parameters on the mesh according to param_specs. QTensor leaves
    shard field-wise along the same logical axes as the dense weight."""
    from ..ops.qtensor import QTensor

    specs = param_specs(params)

    def place(x, s):
        if isinstance(x, QTensor):
            return _shard_qtensor(x, s, mesh)
        return jax.device_put(x, NamedSharding(mesh, s))

    return jax.tree.map(place, params, specs,
                        is_leaf=lambda x: isinstance(x, QTensor))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over dp; tp sees replicas."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
