"""Lightweight activation-capture context (eager-mode instrumentation).

Functional stand-in for the reference's forward hooks
(`experimental_pruning.py:1427-1506` registers hooks on MLP modules to
collect activation statistics): model code calls `record(tag, value)`, which
is a no-op unless a `capturing()` context is active (so jitted production
paths are unaffected).
"""

from __future__ import annotations

import contextlib
import contextvars

import jax.numpy as jnp

_STORE: contextvars.ContextVar[list | None] = contextvars.ContextVar(
    "capture", default=None)


def record(tag: str, value) -> None:
    store = _STORE.get()
    if store is None:
        return
    v = value.astype(jnp.float32)
    store.append({
        "tag": tag,
        "index": len(store),
        "mean_abs": float(jnp.mean(jnp.abs(v))),
        "max_abs": float(jnp.max(jnp.abs(v))),
        "frac_active": float(jnp.mean((jnp.abs(v) > 1e-6))),
        # per-hidden-unit mean |act| (last axis) — used by activation-guided
        # FFN pruning
        "per_unit_mean_abs": jnp.mean(jnp.abs(v), axis=tuple(range(v.ndim - 1))),
        # per-channel absmax (last axis) — SmoothQuant/AWQ smoothing scales
        "per_unit_max_abs": jnp.max(jnp.abs(v), axis=tuple(range(v.ndim - 1))),
        # a small row subsample of the flattened (tokens, channels) view —
        # AWQ's scale search evaluates quantized-matmul MSE on real rows.
        # Strided (not first-N): the first frames of an utterance are often
        # near-silence, and a single-pass calibration would otherwise hand
        # AWQ only that unrepresentative sliver
        "rows": _subsample_rows(v.reshape(-1, v.shape[-1]), 64),
    })


def _subsample_rows(x2, cap: int):
    stride = max(1, x2.shape[0] // cap)
    return x2[::stride][:cap]


def active() -> bool:
    return _STORE.get() is not None


@contextlib.contextmanager
def capturing():
    store: list = []
    token = _STORE.set(store)
    try:
        yield store
    finally:
        _STORE.reset(token)
