"""Attention-head importance by masked-head loss deltas.

Parity with `calculate_head_importance`
(`attention_head_pruning.py:40-165`): baseline loss vs loss with each head
masked out (forward with a (L, H) head mask); importance = loss increase.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperArch
from ..models.whisper import nll_loss

ATTN_KINDS = ("encoder", "decoder", "cross")


def head_importance(params: Any, arch: WhisperArch,
                    batches: Iterable[tuple], kind: str = "encoder") -> np.ndarray:
    """(L, H) importance for one attention family.

    kind: "encoder" (encoder self-attn), "decoder" (decoder self-attn),
    "cross" (decoder cross-attn).
    """
    assert kind in ATTN_KINDS
    comp = "encoder" if kind == "encoder" else "decoder"
    n_layers = len(params[comp]["layers"])
    n_heads = (arch.encoder_heads if comp == "encoder" else arch.decoder_heads)

    mask_kw = {"encoder": "enc_head_masks", "decoder": "dec_head_masks",
               "cross": "cross_head_masks"}[kind]

    @jax.jit
    def loss_fn(params, mel, tokens, labels, masks):
        return nll_loss(params, arch, mel, tokens, labels, **{mask_kw: masks})

    batches = list(batches)
    ones = jnp.ones((n_layers, n_heads), jnp.float32)

    def total_loss(masks):
        return float(sum(
            loss_fn(params, jnp.asarray(m), jnp.asarray(t), jnp.asarray(l), masks)
            for m, t, l in batches))

    base = total_loss(ones)
    imp = np.zeros((n_layers, n_heads), np.float32)
    for li in range(n_layers):
        for h in range(n_heads):
            masks = ones.at[li, h].set(0.0)
            imp[li, h] = total_loss(masks) - base
    return imp


def least_important_heads(importance: np.ndarray, amount: float,
                          min_keep: int = 1) -> dict[int, list[int]]:
    """Per-layer drop lists for prune.structured.prune_heads: the `amount`
    fraction of lowest-importance heads (≥ min_keep kept per layer)."""
    n_layers, n_heads = importance.shape
    n_drop = min(int(round(amount * n_heads)), n_heads - min_keep)
    out = {}
    for li in range(n_layers):
        if n_drop > 0:
            out[li] = list(np.argsort(importance[li])[:n_drop])
    return out
