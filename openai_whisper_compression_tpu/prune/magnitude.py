"""Unstructured pruning: global/per-module L1, random, 4x4 block-structured.

TPU-native re-design of the reference's `torch.nn.utils.prune` usage
(`unstructured_L1_baseline.py:465-529` global L1Unstructured,
`random_pruning.py:376-421` RandomUnstructured,
`experimental_pruning.py:1334-1425` block-structured Frobenius): pruning is a
pure tensor transform producing zeroed weights (masks made permanent
immediately — the reference also calls `prune.remove` right away).

Unstructured sparsity doesn't speed up dense TPU matmuls; it exists for the
same reason as in the reference — accuracy-vs-sparsity studies and compressed
storage (storage.sparse_zip). Structured variants that physically shrink
matmuls live in prune.structured.
"""

from __future__ import annotations

import functools
import re
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..models.params import named_leaves, set_leaf
from ..ops.qtensor import QTensor

# Default scope = every linear weight (reference global L1 targets all
# nn.Linear, `unstructured_L1_baseline.py:465-500`).
LINEAR_RE = re.compile(r"\.(attn|cross)\.(q|k|v|o)\.w$|\.fc[12]\.w$")


def linear_weights(name: str) -> bool:
    return bool(LINEAR_RE.search(name))


def _copy_tree(params: Any) -> Any:
    if isinstance(params, dict):
        return {k: _copy_tree(v) for k, v in params.items()}
    if isinstance(params, list):
        return [_copy_tree(v) for v in params]
    return params


def _targets(params: Any, name_filter: Callable[[str], bool]) -> list[tuple[str, jax.Array]]:
    return [(n, l) for n, l in named_leaves(params)
            if not isinstance(l, QTensor) and name_filter(n)]


# Per-leaf kernels are jitted with traced thresholds/counts so repeated
# application over same-shaped leaves compiles once per shape (eager per-op
# dispatch is expensive on tunnelled TPU backends).

@jax.jit
def _mask_below(leaf: jax.Array, thresh: jax.Array) -> jax.Array:
    return jnp.where(jnp.abs(leaf) > thresh, leaf, 0).astype(leaf.dtype)


@jax.jit
def _l1_prune_leaf(leaf: jax.Array, k: jax.Array) -> jax.Array:
    flat = jnp.sort(jnp.abs(leaf.astype(jnp.float32).reshape(-1)))
    thresh = jnp.where(k > 0, flat[jnp.maximum(k - 1, 0)], -1.0)
    return _mask_below(leaf, thresh)


@jax.jit
def _random_prune_leaf(leaf: jax.Array, key: jax.Array,
                       amount: jax.Array) -> jax.Array:
    mask = jax.random.uniform(key, leaf.shape) >= amount
    return jnp.where(mask, leaf, 0).astype(leaf.dtype)


def prune_global_l1(params: Any, amount: float,
                    name_filter: Callable[[str], bool] = linear_weights) -> Any:
    """Global magnitude pruning: one |w| threshold across all target leaves
    (≈ `prune.global_unstructured(..., L1Unstructured)`; the reference's
    global-threshold variant uses `torch.kthvalue` the same way,
    `global_storing_as sparse.py:150-225`)."""
    targets = _targets(params, name_filter)
    if not targets or amount <= 0:
        return params

    @jax.jit
    def global_thresh(leaves, k):
        mags = jnp.concatenate(
            [jnp.abs(l.astype(jnp.float32).reshape(-1)) for l in leaves])
        return jnp.sort(mags)[jnp.maximum(k - 1, 0)]

    total = sum(l.size for _, l in targets)
    k = int(round(amount * total))
    if k <= 0:
        return params
    thresh = global_thresh([l for _, l in targets], jnp.asarray(k))
    out = _copy_tree(params)
    for n, l in targets:
        set_leaf(out, n, _mask_below(l, thresh))
    return out


def prune_per_module_l1(params: Any, amount: float,
                        name_filter: Callable[[str], bool] = linear_weights,
                        amounts: dict[str, float] | None = None) -> Any:
    """Per-leaf L1 pruning (≈ `prune.l1_unstructured` per module,
    `pruning_and_storing_as_sparse.py:210-228`). `amounts` optionally maps
    leaf name -> rate (the recipe engine feeds this)."""
    out = _copy_tree(params)
    for n, l in _targets(params, name_filter):
        a = amounts.get(n, amount) if amounts else amount
        k = int(round(a * l.size))
        if a <= 0 or k <= 0:
            continue
        set_leaf(out, n, _l1_prune_leaf(l, jnp.asarray(k)))
    return out


def prune_random(params: Any, amount: float, seed: int = 0,
                 name_filter: Callable[[str], bool] = linear_weights) -> Any:
    """Random unstructured pruning (≈ `prune.RandomUnstructured` global,
    `random_pruning.py:376-421`)."""
    out = _copy_tree(params)
    key = jax.random.PRNGKey(seed)
    amt = jnp.asarray(amount, jnp.float32)
    for n, l in _targets(params, name_filter):
        key, sub = jax.random.split(key)
        set_leaf(out, n, _random_prune_leaf(l, sub, amt))
    return out


def prune_blocks(params: Any, amount: float, block: tuple[int, int] = (4, 4),
                 name_filter: Callable[[str], bool] = linear_weights) -> Any:
    """Block-structured pruning: zero the lowest-Frobenius-norm (bh, bw)
    blocks per weight (≈ reference 4x4 block pruning,
    `experimental_pruning.py:1334-1425`)."""
    bh, bw = block

    @functools.partial(jax.jit, static_argnames=("bh", "bw"))
    def block_prune(l, k, bh, bw):
        r, c = l.shape
        blocks = l.reshape(r // bh, bh, c // bw, bw)
        norms = jnp.sqrt(jnp.sum(blocks.astype(jnp.float32) ** 2, axis=(1, 3)))
        thresh = jnp.sort(norms.reshape(-1))[jnp.maximum(k - 1, 0)]
        mask = (norms > thresh)[:, None, :, None]
        return (blocks * mask).reshape(r, c).astype(l.dtype)

    out = _copy_tree(params)
    for n, l in _targets(params, name_filter):
        if l.ndim != 2 or l.shape[0] % bh or l.shape[1] % bw:
            continue
        k = int(round(amount * (l.size // (bh * bw))))
        if k <= 0:
            continue
        set_leaf(out, n, block_prune(l, jnp.asarray(k), bh, bw))
    return out


@jax.jit
def _progressive_rows(pos: jax.Array, max_amount: jax.Array) -> jax.Array:
    """Per-row magnitude pruning with a linearly increasing rate."""
    t, d = pos.shape
    rates = jnp.linspace(0.0, 1.0, t) * max_amount          # (T,)
    mags = jnp.abs(pos.astype(jnp.float32))
    sorted_mags = jnp.sort(mags, axis=1)                     # (T, d)
    k = jnp.clip(jnp.round(rates * d).astype(jnp.int32), 0, d - 1)
    thresh = jnp.take_along_axis(sorted_mags, k[:, None], axis=1)  # (T, 1)
    keep = jnp.logical_or(mags > thresh, (k == 0)[:, None])
    return jnp.where(keep, pos, 0).astype(pos.dtype)


def prune_positional_progressive(params: Any, max_amount: float = 0.5) -> Any:
    """Position-dependent pruning of the learned decoder positions: later
    (rarely used) positions pruned harder, ramping linearly from 0 to
    `max_amount` (TPU-design variant of position-dependent embedding
    pruning, `experimental_pruning.py:1100-1186`)."""
    out = _copy_tree(params)
    out["decoder"]["pos"] = _progressive_rows(
        params["decoder"]["pos"], jnp.asarray(max_amount, jnp.float32))
    return out


@jax.jit
def _position_rate_rows(pos: jax.Array, early: jax.Array,
                        late: jax.Array) -> jax.Array:
    """Per-row magnitude pruning at a position-dependent rate: first third of
    positions at `early`, last third at `late`, linear interpolation in the
    middle third (exact reference schedule,
    `experimental_pruning.py:1139-1161`)."""
    t, d = pos.shape
    lo, hi = t // 3, 2 * t // 3
    idx = jnp.arange(t)
    frac = jnp.clip((idx - lo) / jnp.maximum(hi - lo, 1), 0.0, 1.0)
    rates = jnp.where(idx < lo, early,
                      jnp.where(idx >= hi, late, early + frac * (late - early)))
    mags = jnp.abs(pos.astype(jnp.float32))
    sorted_mags = jnp.sort(mags, axis=1)
    k = jnp.clip(jnp.round(rates * d).astype(jnp.int32), 0, d - 1)
    thresh = jnp.take_along_axis(sorted_mags, k[:, None], axis=1)
    keep = jnp.logical_or(mags > thresh, (k == 0)[:, None])
    return jnp.where(keep, pos, 0).astype(pos.dtype)


def prune_positional_position_dependent(params: Any, early: float = 0.4,
                                        late: float = 0.2) -> Any:
    """Reference-parity position-dependent embedding pruning
    (`custom_position_based_pruning`, `experimental_pruning.py:1100-1186`):
    EARLY positions pruned harder (`early`), late positions lighter
    (`late`), linear ramp across the middle third. Applied to every
    positional table (the reference hits every `embed_positions` module —
    encoder sinusoids included, since HF stores them as a weight)."""
    out = _copy_tree(params)
    e = jnp.asarray(early, jnp.float32)
    la = jnp.asarray(late, jnp.float32)
    for comp in ("encoder", "decoder"):
        if "pos" in out[comp]:
            out[comp]["pos"] = _position_rate_rows(params[comp]["pos"], e, la)
    return out


# ---------------------------------------------------------------------------
# Reporting (≈ reference `calculate_sparsity` `unstructured_L1_baseline.py:534`
# and `calculate_pruned_dense_size` :31-97)
# ---------------------------------------------------------------------------

@jax.jit
def _count_zeros(leaf: jax.Array) -> jax.Array:
    return jnp.sum(leaf == 0)


def sparsity_report(params: Any,
                    name_filter: Callable[[str], bool] | None = None) -> dict:
    per_leaf: dict[str, dict] = {}
    total = zeros = 0
    weights_total = weights_zeros = 0
    bias_total = bias_zeros = 0
    for n, l in named_leaves(params):
        if isinstance(l, QTensor):
            continue
        if name_filter is not None and not name_filter(n):
            continue
        z = int(_count_zeros(l))
        s = int(l.size)
        per_leaf[n] = {"sparsity": z / max(s, 1), "zeros": z, "size": s}
        total += s
        zeros += z
        if n.endswith(".b") or n.endswith("_ln.g") or n.endswith("_ln.b"):
            bias_total += s
            bias_zeros += z
        else:
            weights_total += s
            weights_zeros += z
    nnz = total - zeros
    return {
        "overall_sparsity": zeros / max(total, 1),
        "weight_sparsity": weights_zeros / max(weights_total, 1),
        "bias_sparsity": bias_zeros / max(bias_total, 1),
        "total_params": total,
        "nonzero_params": nnz,
        "theoretical_dense_pruned_mb": nnz * 4 / (1024 ** 2),
        "per_leaf": per_leaf,
    }


def component_sparsity(params: Any) -> dict[str, float]:
    """Sparsity rolled up by component category (≈ the component-sparsity
    reporter at `experimental_pruning.py:603`)."""
    from .targeted import categorize

    agg: dict[str, list[int]] = {}
    for n, l in named_leaves(params):
        if isinstance(l, QTensor):
            continue
        cat = categorize(n)
        z, s = int(_count_zeros(l)), int(l.size)
        tz, ts = agg.setdefault(cat, [0, 0])
        agg[cat] = [tz + z, ts + s]
    return {c: z / max(s, 1) for c, (z, s) in sorted(agg.items())}
