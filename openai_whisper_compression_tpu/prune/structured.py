"""Structured pruning that physically shrinks tensors.

The reference's structured variants only zero rows/heads (masked
reparameterization, e.g. `structured_L2_baseline.py:461-528`,
`attention_head_pruning.py:168-264`, layer dropping
`experimental_pruning.py:441-505`) — dense shapes stay. On TPU the win comes
from *smaller matmuls visible to XLA*, so the primary API here slices weights
for real: per-layer head counts / FFN widths / layer lists are read from the
pytree (models.whisper derives head counts from shapes), so the same model
code re-traces with the smaller dims. Zeroing variants are kept for
accuracy-parity studies with the reference.
"""

from __future__ import annotations

import re
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..config import WhisperArch
from ..models.params import named_leaves, set_leaf
from .magnitude import _copy_tree


# ---------------------------------------------------------------------------
# L2 structured (zeroing, reference-parity:
# `prune.ln_structured(n=2, dim=0)` zeroes output channels)
# ---------------------------------------------------------------------------

def prune_l2_structured(params: Any, amount: float,
                        name_filter=None) -> Any:
    """Zero the lowest-L2-norm output channels (columns of our (in,out)
    weights) per linear (`structured_L2_baseline.py:461-528`)."""
    import jax

    from .magnitude import linear_weights

    @jax.jit
    def l2_prune(l, k):
        norms = jnp.linalg.norm(l.astype(jnp.float32), axis=0)  # per out-chan
        thresh = jnp.sort(norms)[jnp.maximum(k - 1, 0)]
        return (l * (norms > thresh)[None, :]).astype(l.dtype)

    name_filter = name_filter or linear_weights
    out = _copy_tree(params)
    for n, l in named_leaves(params):
        if l is None or not hasattr(l, "ndim") or l.ndim != 2:
            continue
        if not name_filter(n):
            continue
        k = int(round(amount * l.shape[1]))
        if k <= 0:
            continue
        set_leaf(out, n, l2_prune(l, jnp.asarray(k)))
    return out


# ---------------------------------------------------------------------------
# Attention-head pruning
# ---------------------------------------------------------------------------

def head_l1_scores(layer: dict, head_dim: int) -> jnp.ndarray:
    """Per-head L1 mass of q/k/v/o slices (≈ head pruning by L1 norm,
    `experimental_pruning.py:2220-2351`)."""
    qw = layer["q"]["w"]
    n_heads = qw.shape[1] // head_dim
    score = jnp.zeros((n_heads,), jnp.float32)
    for proj in ("q", "k", "v"):
        w = layer[proj]["w"].astype(jnp.float32)
        score = score + jnp.sum(
            jnp.abs(w.reshape(w.shape[0], n_heads, head_dim)), axis=(0, 2))
    ow = layer["o"]["w"].astype(jnp.float32)
    score = score + jnp.sum(
        jnp.abs(ow.reshape(n_heads, head_dim, -1)), axis=(1, 2))
    return score


def _slice_head_cols(p: dict, keep: np.ndarray, head_dim: int) -> dict:
    """Keep selected head column-blocks of a column-parallel projection."""
    w = p["w"]
    n_heads = w.shape[1] // head_dim
    cols = w.reshape(w.shape[0], n_heads, head_dim)[:, keep, :]
    out = {"w": cols.reshape(w.shape[0], -1)}
    if "b" in p:
        out["b"] = p["b"].reshape(n_heads, head_dim)[keep].reshape(-1)
    return out


def _slice_head_rows(p: dict, keep: np.ndarray, head_dim: int) -> dict:
    w = p["w"]
    n_heads = w.shape[0] // head_dim
    rows = w.reshape(n_heads, head_dim, w.shape[1])[keep]
    out = {"w": rows.reshape(-1, w.shape[1])}
    if "b" in p:
        out["b"] = p["b"]
    return out


def prune_heads(params: Any, arch: WhisperArch,
                drop: dict[str, dict[int, list[int]]],
                physical: bool = True) -> Any:
    """Remove attention heads.

    drop: {"encoder.attn" | "decoder.attn" | "decoder.cross":
           {layer_idx: [head, ...]}}.
    physical=True slices q/k/v columns + o rows (smaller matmuls, smaller KV
    cache); False zeroes the slices (reference behavior,
    `attention_head_pruning.py:168-264`).
    """
    out = _copy_tree(params)
    hd = arch.head_dim
    for key, layer_map in drop.items():
        comp, attn_name = key.split(".")
        for li, heads in layer_map.items():
            layer = out[comp]["layers"][li][attn_name]
            n_heads = layer["q"]["w"].shape[1] // hd
            keep = np.asarray([h for h in range(n_heads) if h not in set(heads)])
            if len(keep) == 0:
                raise ValueError(f"cannot drop all heads of {key} layer {li}")
            if physical:
                for proj in ("q", "k", "v"):
                    layer[proj] = _slice_head_cols(layer[proj], keep, hd)
                layer["o"] = _slice_head_rows(layer["o"], keep, hd)
            else:
                mask = np.zeros((n_heads,), np.float32)
                mask[keep] = 1.0
                m = jnp.asarray(np.repeat(mask, hd))
                for proj in ("q", "k", "v"):
                    layer[proj]["w"] = layer[proj]["w"] * m[None, :]
                    if "b" in layer[proj]:
                        layer[proj]["b"] = layer[proj]["b"] * m
                layer["o"]["w"] = layer["o"]["w"] * m[:, None]
    return out


def prune_heads_by_l1(params: Any, arch: WhisperArch, amount: float,
                      components: tuple[str, ...] = ("encoder.attn",
                                                     "decoder.attn",
                                                     "decoder.cross"),
                      physical: bool = True) -> Any:
    """Drop the `amount` fraction of lowest-L1 heads per attention module."""
    drop: dict[str, dict[int, list[int]]] = {}
    for key in components:
        comp, attn_name = key.split(".")
        layer_map = {}
        for li, layer in enumerate(params[comp]["layers"]):
            scores = np.asarray(head_l1_scores(layer[attn_name], arch.head_dim))
            n_drop = int(round(amount * scores.size))
            n_drop = min(n_drop, scores.size - 1)  # keep >= 1 head
            if n_drop > 0:
                layer_map[li] = list(np.argsort(scores)[:n_drop])
        if layer_map:
            drop[key] = layer_map
    return prune_heads(params, arch, drop, physical=physical)


# ---------------------------------------------------------------------------
# FFN shrinking / MLP removal
# ---------------------------------------------------------------------------

def shrink_ffn(params: Any, component: str, layer_idx: int,
               keep_fraction: float) -> Any:
    """Physically shrink one layer's FFN: rank hidden units by
    |fc1 col| + |fc2 row| L1 and slice (≈ activation/magnitude-guided MLP
    pruning, `experimental_pruning.py:1427-1562`, but with real slicing)."""
    out = _copy_tree(params)
    layer = out[component]["layers"][layer_idx]
    w1, w2 = layer["fc1"]["w"], layer["fc2"]["w"]
    ffn = w1.shape[1]
    n_keep = max(int(round(keep_fraction * ffn)), 1)
    score = (jnp.sum(jnp.abs(w1.astype(jnp.float32)), axis=0) +
             jnp.sum(jnp.abs(w2.astype(jnp.float32)), axis=1))
    keep = np.sort(np.asarray(jnp.argsort(-score)[:n_keep]))
    layer["fc1"] = {"w": w1[:, keep], "b": layer["fc1"]["b"][keep]}
    layer["fc2"] = {"w": w2[keep, :], "b": layer["fc2"]["b"]}
    return out


def remove_mlp(params: Any, component: str, layer_indices: list[int]) -> Any:
    """Remove MLP contribution of given layers (zero fc2 → residual passes
    through; ≈ MLP removal, `experimental_pruning.py:2899-2975`)."""
    out = _copy_tree(params)
    for li in layer_indices:
        layer = out[component]["layers"][li]
        layer["fc2"] = {"w": jnp.zeros_like(layer["fc2"]["w"]),
                        "b": jnp.zeros_like(layer["fc2"]["b"])}
    return out


# ---------------------------------------------------------------------------
# Layer dropping
# ---------------------------------------------------------------------------

def drop_layers(params: Any, component: str, indices: list[int]) -> Any:
    """Physically remove whole transformer layers (≈ layer dropping,
    `experimental_pruning.py:441-505`); the Python layer list shrinks, so the
    model re-traces with fewer layers (and a smaller KV cache)."""
    out = _copy_tree(params)
    keep = [l for i, l in enumerate(out[component]["layers"])
            if i not in set(indices)]
    if not keep:
        raise ValueError("cannot drop all layers")
    out[component]["layers"] = keep
    return out
