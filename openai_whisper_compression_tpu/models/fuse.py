"""Decode-time parameter fusion.

The decode loop is per-step kernel-count bound (hundreds of small matmuls per
token); fusing the self-attention q/k/v projections into one (d, 3·H·Dh)
matmul removes 2 kernels per layer per step. Apply AFTER compression
(pruning filters and quantization target the unfused q/k/v names); works on
dense arrays and on per-channel QTensors (concat along the output axis, the
per-channel scales concatenate with them).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp

from ..ops.qtensor import QTensor

# every 2-D kind now keeps N as the data/scale last axis (nf4/fp4 moved to
# column-K blockwise layout), so all weight-only kinds concat along N
FUSABLE_KINDS = ("int8_pc", "int4_pack", "int2_pack", "fp8", "group_asym",
                 "nf4", "fp4")


def _concat_qtensors(tensors: list[QTensor]) -> QTensor | None:
    kinds = {t.kind for t in tensors}
    if len(kinds) != 1 or tensors[0].kind not in FUSABLE_KINDS:
        return None
    t0 = tensors[0]

    def cat(field):
        vals = [getattr(t, field) for t in tensors]
        if any(v is None for v in vals):
            return None
        return jnp.concatenate(vals, axis=1)

    k = t0.shape[0]
    n = sum(t.shape[1] for t in tensors)
    return dataclasses.replace(t0, data=cat("data"), scale=cat("scale"),
                               zero=cat("zero"), scale2=cat("scale2"),
                               offset2=cat("offset2"), shape=(k, n))


def _fuse_attn(attn: dict) -> dict | None:
    """{q,k,v,o} -> {qkv,o}; returns None when the weights can't fuse."""
    qw, kw, vw = attn["q"]["w"], attn["k"]["w"], attn["v"]["w"]
    if isinstance(qw, QTensor) or isinstance(kw, QTensor) or isinstance(vw, QTensor):
        if not (isinstance(qw, QTensor) and isinstance(kw, QTensor)
                and isinstance(vw, QTensor)):
            return None
        w = _concat_qtensors([qw, kw, vw])
        if w is None:
            return None
        d_out = qw.shape[1]
    else:
        w = jnp.concatenate([qw, kw, vw], axis=1)
        d_out = qw.shape[1]
    qb = attn["q"].get("b")
    vb = attn["v"].get("b")
    b = jnp.concatenate([
        qb if qb is not None else jnp.zeros((d_out,), jnp.float32),
        jnp.zeros((d_out,), qb.dtype if qb is not None else jnp.float32),
        vb if vb is not None else jnp.zeros((d_out,), jnp.float32),
    ])
    return {"qkv": {"w": w, "b": b}, "o": attn["o"]}


def fuse_qkv(params: Any, components: tuple[str, ...] = ("decoder",)) -> Any:
    """Fuse self-attention q/k/v per layer of the given components.

    Leaves layers whose weights can't fuse (e.g. NF4 blockwise) unchanged —
    the model code handles mixed fused/unfused layers.
    """
    from ..prune.structured import _copy_tree

    out = _copy_tree(params)
    for comp in components:
        for layer in out[comp]["layers"]:
            fused = _fuse_attn(layer["attn"])
            if fused is not None:
                layer["attn"] = fused
    return out


def unfuse_qkv(params: Any) -> Any:
    """Inverse of fuse_qkv for dense weights (dequantize first if needed):
    splits each fused qkv back into q/k/v with Whisper's bias layout
    (k bias dropped — it is structurally zero)."""
    from ..prune.structured import _copy_tree

    out = _copy_tree(params)
    for comp in ("encoder", "decoder"):
        for layer in out[comp]["layers"]:
            attn = layer["attn"]
            if "qkv" not in attn:
                continue
            w = attn["qkv"]["w"]
            if isinstance(w, QTensor):
                raise ValueError("dequantize before unfusing")
            d = w.shape[1] // 3
            b = attn["qkv"]["b"]
            layer["attn"] = {
                "q": {"w": w[:, :d], "b": b[:d]},
                "k": {"w": w[:, d: 2 * d]},
                "v": {"w": w[:, 2 * d:], "b": b[2 * d:]},
                "o": attn["o"],
            }
    return out


def qkv_split(fused_out: jnp.ndarray) -> tuple:
    """(.., 3*H*Dh) -> three (.., H*Dh) projections."""
    d = fused_out.shape[-1] // 3
    return (fused_out[..., :d], fused_out[..., d: 2 * d],
            fused_out[..., 2 * d:])
