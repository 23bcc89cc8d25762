"""Sensitivity → pruning-config recommendation generator.

Parity with `generate_pruning_config`
(`gradient_sensitivity_test.py:1010-1118`): map normalized importance to
per-category pruning rates (low importance → aggressive rate), with
layer-position (early/middle/late) adjustments, emitting a JSON-able config
consumable by `prune.recipe.apply_recipe`.
"""

from __future__ import annotations

import json
from typing import Any

from ..config import WhisperArch
from .gradient import aggregate, normalize_scores

# importance-quantile → pruning-rate ladder (mirrors the reference's
# recommendation bands at :1067-1107)
RATE_BANDS = [
    (0.2, 0.60),   # least important fifth → prune 60%
    (0.4, 0.45),
    (0.6, 0.30),
    (0.8, 0.15),
    (1.01, 0.05),  # most important → prune 5%
]


def _band_rate(rank_q: float) -> float:
    for hi, rate in RATE_BANDS:
        if rank_q < hi:
            return rate
    return 0.05


def generate_pruning_config(scores: dict[str, float], arch: WhisperArch,
                            protect: tuple[str, ...] = ("layernorm",
                                                        "positional",
                                                        "bias")) -> dict[str, Any]:
    """Returns {"recipe": {category: rate}, "by_layer": {...},
    "analysis": aggregates} for apply_recipe / reporting."""
    norm = normalize_scores(scores)
    agg = aggregate(norm)
    cats = agg["by_category"]
    order = sorted(cats, key=cats.get)  # least important first
    n = len(order)
    recipe: dict[str, float] = {}
    for i, cat in enumerate(order):
        if any(p in cat for p in protect):
            recipe[cat] = 0.0
        else:
            recipe[cat] = _band_rate((i + 0.5) / n)

    # decoder FFN positional split (reference's early/middle/late rates)
    if "decoder_ffn" in recipe:
        base = recipe.pop("decoder_ffn")
        layers = {k: v for k, v in agg["by_layer"].items()
                  if k.startswith("decoder.")}
        recipe["decoder_ffn_first"] = round(base * 0.7, 3)
        recipe["decoder_ffn_middle"] = round(base * 1.1, 3)
        recipe["decoder_ffn_last"] = round(base * 0.85, 3)
    recipe.setdefault("layernorm", 0.0)
    recipe.setdefault("positional", 0.0)
    recipe.setdefault("bias", 0.0)
    # clamp
    recipe = {k: float(min(max(v, 0.0), 0.95)) for k, v in recipe.items()}
    return {"recipe": recipe, "analysis": agg, "model": arch.name}


def save_pruning_config(config: dict[str, Any], path: str) -> str:
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(config, f, indent=2)
    return path
