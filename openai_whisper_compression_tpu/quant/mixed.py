"""Sensitivity-driven mixed-precision quantization.

The quantization-axis counterpart of `sensitivity/recommend.py` (which turns
gradient/Fisher scores into a pruning recipe, parity with the reference's
recommendation generator `gradient_sensitivity_test.py:1010-1118`): allocate
per-layer weight bit-widths under an average-bits budget, spending bits where
the model is sensitive. Beyond-reference — the reference only ever applies
one uniform method per run (`quantization.py:42-90`).

Allocation is a greedy demotion ladder: every quantizable leaf starts at the
widest rung; leaves are demoted one rung at a time in ascending-importance
order (least important first, wave by wave) until the parameter-weighted
average bit-width meets the target. Importance ties break toward demoting
smaller leaves last, so a given budget buys protection for the most
parameters possible.
"""

from __future__ import annotations

import json
from typing import Any

import numpy as np

from ..models.params import named_leaves
from ..ops.qtensor import QTensor
from .api import LINEAR_WEIGHT_RE, quantize_params
from .core import QUANTIZERS

# nominal stored bits/weight per QUANTIZERS method (scale/zero metadata is
# O(1/group) and identical across rungs at fixed group size, so it cancels
# in the average)
METHOD_BITS: dict[str, float] = {
    "int2": 2, "hqq_int3": 3, "int4": 4, "nf4": 4, "fp4": 4, "hqq_int4": 4,
    "nf4_dq": 4, "fp4_dq": 4, "int8": 8, "hqq_int8": 8, "fp8": 8,
}
# every rung must be an applicable QUANTIZERS method, or configs could be
# generated that apply_quant_config cannot apply
assert set(METHOD_BITS) <= set(QUANTIZERS)

DEFAULT_LADDER = ("int4", "int8")


def quantizable_leaves(params: Any) -> list[tuple[str, int]]:
    """(name, n_params) for every linear weight the mixed config governs."""
    out = []
    for name, leaf in named_leaves(params):
        if isinstance(leaf, QTensor) or not LINEAR_WEIGHT_RE.search(name):
            continue
        out.append((name, int(np.prod(leaf.shape))))
    return out


def generate_quant_config(params: Any, scores: dict[str, float],
                          target_bits: float = 6.0,
                          ladder: tuple[str, ...] = DEFAULT_LADDER) -> dict:
    """Assign each linear weight a rung from `ladder` (ascending bit-width)
    so the parameter-weighted average ≤ `target_bits`, protecting the most
    sensitive leaves. `scores` = {leaf_name: sensitivity} from
    `sensitivity.gradient.compute_sensitivity` (missing names rank least
    important). Raises when the budget is below the ladder floor."""
    for m in ladder:
        if m not in METHOD_BITS:
            raise KeyError(f"unknown ladder method {m!r}; "
                           f"have {sorted(METHOD_BITS)}")
    if len(ladder) < 2 or any(METHOD_BITS[a] >= METHOD_BITS[b]
                              for a, b in zip(ladder, ladder[1:])):
        raise ValueError("ladder must list ≥2 methods in ascending bits")
    leaves = quantizable_leaves(params)
    if not leaves:
        raise ValueError("no quantizable linear weights in params")
    total = sum(n for _, n in leaves)
    floor = METHOD_BITS[ladder[0]]
    if target_bits < floor:
        raise ValueError(f"target_bits={target_bits} below ladder floor "
                         f"{floor} ({ladder[0]})")
    # ascending importance; ties demote big leaves first (cheapest bits)
    order = sorted(leaves, key=lambda kv: (scores.get(kv[0], 0.0), -kv[1]))
    rung = {name: len(ladder) - 1 for name, _ in leaves}

    def avg_bits() -> float:
        return sum(METHOD_BITS[ladder[rung[n]]] * c
                   for n, c in leaves) / total

    while avg_bits() > target_bits:
        demoted = False
        for name, _ in order:
            if rung[name] > 0:
                rung[name] -= 1
                demoted = True
                if avg_bits() <= target_bits:
                    break
        if not demoted:        # everything at the floor already
            break
    assignments = {name: ladder[rung[name]] for name, _ in leaves}
    return {
        "assignments": assignments,
        "ladder": list(ladder),
        "target_bits": float(target_bits),
        "avg_bits": round(avg_bits(), 4),
        "counts": {m: sum(1 for v in assignments.values() if v == m)
                   for m in ladder},
    }


def apply_quant_config(params: Any, config: dict) -> Any:
    """Apply a generate_quant_config result: one quantize_params pass per
    distinct method, scoped by name_filter, so every leaf rides the same
    QTensor kinds (and Pallas kernels) as uniform quantization."""
    assignments: dict[str, str] = config["assignments"]
    present = {n for n, _ in quantizable_leaves(params)}
    missing = sorted(set(assignments) - present)
    if missing:
        # a config generated for a different checkpoint/arch would
        # otherwise silently leave weights dense while the caller reports
        # the config's avg_bits
        raise KeyError(
            f"{len(missing)} assigned leaves absent from params (config "
            f"from a different model?), e.g. {missing[:3]}")
    out = params
    for method in dict.fromkeys(assignments.values()):
        names = {n for n, m in assignments.items() if m == method}
        out = quantize_params(out, method,
                              name_filter=lambda n, s=names: n in s)
    return out


def save_quant_config(config: dict, path: str) -> str:
    with open(path, "w") as f:
        json.dump(config, f, indent=2)
    return path


def load_quant_config(path: str) -> dict:
    with open(path) as f:
        return json.load(f)
