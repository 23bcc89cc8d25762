"""Gradient-based parameter sensitivity (1st-order |grad| and Fisher grad²).

Parity with the reference's two sensitivity scripts — per-weight-matrix
|grad| mean (`gradient_sensitivity_test.py:229-280`) and Fisher diagonal ≈
grad² mean (`hessian_sensitivity_test.py:536-566`) — via `jax.grad` of the
teacher-forced NLL, jit-compiled once for the whole batch set.
"""

from __future__ import annotations

from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperArch
from ..models.params import named_leaves
from ..models.whisper import nll_loss
from ..prune.targeted import categorize, layer_index


def _grad_accumulator(arch: WhisperArch, power: float):
    @jax.jit
    def batch_stats(params, mel, tokens, labels):
        grads = jax.grad(nll_loss)(params, arch, mel, tokens, labels)
        return jax.tree.map(
            lambda g: jnp.mean(jnp.abs(g.astype(jnp.float32)) ** power), grads)

    return batch_stats


def compute_sensitivity(params: Any, arch: WhisperArch,
                        batches: Iterable[tuple], power: float = 1.0) -> dict[str, float]:
    """power=1 → |grad| (gradient test); power=2 → Fisher diagonal proxy.

    batches: iterable of (mel, tokens, labels). Returns {leaf_name: score}.
    """
    fn = _grad_accumulator(arch, power)
    acc: dict[str, float] = {}
    n = 0
    for mel, tokens, labels in batches:
        stats = fn(params, jnp.asarray(mel), jnp.asarray(tokens),
                   jnp.asarray(labels))
        for name, v in named_leaves(stats):
            acc[name] = acc.get(name, 0.0) + float(v)
        n += 1
    return {k: v / max(n, 1) for k, v in acc.items()}


def compute_fisher_sensitivity(params: Any, arch: WhisperArch,
                               batches: Iterable[tuple]) -> dict[str, float]:
    """Fisher diagonal ≈ E[grad²] (`hessian_sensitivity_test.py:557-566`)."""
    return compute_sensitivity(params, arch, batches, power=2.0)


def normalize_scores(scores: dict[str, float]) -> dict[str, float]:
    """Normalized importance in [0, 1] (reference :300-330)."""
    vals = np.asarray(list(scores.values()))
    lo, hi = float(vals.min()), float(vals.max())
    rng = max(hi - lo, 1e-12)
    return {k: (v - lo) / rng for k, v in scores.items()}


def aggregate(scores: dict[str, float]) -> dict[str, Any]:
    """Roll-ups by component category and by (component, layer) — reference
    per-layer aggregation (:326-373)."""
    by_cat: dict[str, list[float]] = {}
    by_layer: dict[tuple[str, int], list[float]] = {}
    for name, s in scores.items():
        by_cat.setdefault(categorize(name), []).append(s)
        li = layer_index(name)
        if li is not None:
            comp = name.split(".")[0]
            by_layer.setdefault((comp, li), []).append(s)
    return {
        "by_category": {k: float(np.mean(v)) for k, v in sorted(by_cat.items())},
        "by_layer": {f"{c}.{i}": float(np.mean(v))
                     for (c, i), v in sorted(by_layer.items())},
    }


def batches_from_dataset(arch: WhisperArch, dataset, tokenizer,
                         batch: int = 2, max_seq: int = 32):
    """(mel, tokens, labels) batches from real utterances: log-mel features +
    teacher-forced token targets from the reference transcripts (the
    reference builds the same inputs at `gradient_sensitivity_test.py:157-228`)."""
    import jax.numpy as jnp

    from ..audio import features
    from ..evaluation.harness import samples_for_arch

    n_samples = samples_for_arch(arch)
    out = []
    for i in range(0, len(dataset) - batch + 1, batch):
        utts = dataset[i: i + batch]
        wav = np.zeros((batch, n_samples), np.float32)
        toks = np.full((batch, max_seq), arch.eos_token_id, np.int32)
        labels = np.full((batch, max_seq), arch.eos_token_id, np.int32)
        for j, u in enumerate(utts):
            n = min(len(u.audio), n_samples)
            wav[j, :n] = u.audio[:n]
            ids = [arch.decoder_start_token_id] + tokenizer.encode(u.text)
            ids = ids[: max_seq + 1]
            toks[j, : len(ids) - 1] = ids[:-1]
            labels[j, : len(ids) - 1] = ids[1:]
        mel = np.asarray(features.preprocess(jnp.asarray(wav),
                                             arch.num_mel_bins,
                                             length=n_samples))
        out.append((mel, toks, labels))
    return out


def make_synthetic_batches(arch: WhisperArch, n_batches: int = 2,
                           batch: int = 2, seq: int = 8, seed: int = 0,
                           mel_frames: int | None = None):
    """Random (mel, tokens, labels) batches for offline sensitivity runs."""
    g = np.random.default_rng(seed)
    mel_frames = mel_frames or 2 * arch.max_source_positions
    out = []
    for _ in range(n_batches):
        mel = g.standard_normal((batch, arch.num_mel_bins, mel_frames)).astype(np.float32)
        toks = g.integers(0, arch.vocab_size, (batch, seq))
        labels = g.integers(0, arch.vocab_size, (batch, seq))
        out.append((mel, toks, labels))
    return out
