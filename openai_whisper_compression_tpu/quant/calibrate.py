"""Static activation-quant calibration.

Equivalent of quanto's `with Calibration(): evaluate(...)` pass the reference
runs at `model_utils.py:193-211` / `static_quantization.py:178-182`: run
representative batches through the model while a context records each
quantized linear's input absmax, then freeze those into per-layer activation
scales.

Calibration runs in eager mode (no jit) so the context can observe concrete
activation values; the frozen model then jits as usual.
"""

from __future__ import annotations

import contextlib
import contextvars
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.qtensor import QTensor

_CALIB: contextvars.ContextVar[dict | None] = contextvars.ContextVar(
    "calibration", default=None)


def observe(q: QTensor, x: jax.Array) -> None:
    """Called by ops.linear during calibration for every quantized matmul."""
    store = _CALIB.get()
    if store is None:
        return
    key = id(q)
    val = float(jnp.max(jnp.abs(x)))
    store[key] = max(store.get(key, 0.0), val)


def active() -> bool:
    return _CALIB.get() is not None


@contextlib.contextmanager
def calibration():
    """Context manager collecting activation absmax per QTensor."""
    store: dict[int, float] = {}
    token = _CALIB.set(store)
    try:
        yield store
    finally:
        _CALIB.reset(token)


def freeze(params: Any, store: dict[int, float]) -> Any:
    """Write observed activation scales into each calibrated QTensor
    (absmax/127 for int8 activations, absmax/448 for fp8 e4m3). QTensors
    never observed (e.g. a layer that didn't run) keep dynamic behavior."""
    def fz(leaf):
        if isinstance(leaf, QTensor) and leaf.act in ("static_int8",
                                                      "static_fp8"):
            amax = store.get(id(leaf))
            if amax is not None and amax > 0:
                import dataclasses

                div = 127.0 if leaf.act == "static_int8" else 448.0
                return dataclasses.replace(
                    leaf, act_scale=jnp.asarray(amax / div, jnp.float32))
        return leaf

    return jax.tree.map(fz, params, is_leaf=lambda x: isinstance(x, QTensor))
