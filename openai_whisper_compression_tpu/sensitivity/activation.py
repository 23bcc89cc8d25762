"""Activation-statistics sensitivity (FFN hidden-unit utilization).

Parity with the reference's hook-based MLP activation collection and
activation-guided MLP pruning (`experimental_pruning.py:1427-1562`): run
batches under the capture context, aggregate per-layer/per-unit |activation|
stats, and derive keep-sets for FFN shrinking.
"""

from __future__ import annotations

from typing import Any, Iterable

import numpy as np

from ..config import WhisperArch
from ..models.whisper import forward
from ..utils import capture


def collect_ffn_stats(params: Any, arch: WhisperArch,
                      batches: Iterable[tuple]) -> list[dict]:
    """Run batches eagerly with capture on; returns one record per MLP call
    in call order: encoder layers 0..E-1 then decoder layers 0..D-1 per
    batch, aggregated across batches."""
    import jax.numpy as jnp

    n_enc = len(params["encoder"]["layers"])
    n_dec = len(params["decoder"]["layers"])
    per_call: list[dict] | None = None
    n_batches = 0
    for mel, tokens, _ in batches:
        with capture.capturing() as store:
            forward(params, arch, jnp.asarray(mel), jnp.asarray(tokens))
        records = [r for r in store if r["tag"] == "ffn_act"]
        assert len(records) == n_enc + n_dec
        if per_call is None:
            per_call = [{"mean_abs": 0.0, "frac_active": 0.0,
                         "per_unit_mean_abs": np.zeros_like(
                             np.asarray(r["per_unit_mean_abs"]))}
                        for r in records]
        for agg, r in zip(per_call, records):
            agg["mean_abs"] += r["mean_abs"]
            agg["frac_active"] += r["frac_active"]
            agg["per_unit_mean_abs"] += np.asarray(r["per_unit_mean_abs"])
        n_batches += 1
    out = []
    for i, agg in enumerate(per_call or []):
        comp = "encoder" if i < n_enc else "decoder"
        li = i if i < n_enc else i - n_enc
        out.append({
            "component": comp, "layer": li,
            "mean_abs": agg["mean_abs"] / n_batches,
            "frac_active": agg["frac_active"] / n_batches,
            "per_unit_mean_abs": agg["per_unit_mean_abs"] / n_batches,
        })
    return out


def activation_guided_ffn_prune(params: Any, arch: WhisperArch,
                                batches: Iterable[tuple],
                                keep_fraction: float = 0.5) -> Any:
    """Shrink every FFN to its most-active hidden units (physical slicing;
    ≈ `prune_mlp_by_activation`, `experimental_pruning.py:1508-1562`)."""
    from ..prune.structured import _copy_tree

    stats = collect_ffn_stats(params, arch, batches)
    out = _copy_tree(params)
    for rec in stats:
        layer = out[rec["component"]]["layers"][rec["layer"]]
        w1, w2 = layer["fc1"]["w"], layer["fc2"]["w"]
        ffn = w1.shape[1]
        n_keep = max(int(round(keep_fraction * ffn)), 1)
        keep = np.sort(np.argsort(-rec["per_unit_mean_abs"])[:n_keep])
        layer["fc1"] = {"w": w1[:, keep], "b": layer["fc1"]["b"][keep]}
        layer["fc2"] = {"w": w2[keep, :], "b": layer["fc2"]["b"]}
    return out
