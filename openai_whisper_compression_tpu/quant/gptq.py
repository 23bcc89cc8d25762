"""GPTQ — Hessian-aware one-shot weight quantization (arXiv:2210.17323).

The reference's quant lab covers round-to-nearest families (quanto/bnb/
torch-dynamic, `model_utils.py:126-134`) and HQQ's data-free solve
(`model_utils.py:52-73`). GPTQ adds the data-AWARE method: per layer it
minimizes ||X (W - Ŵ)||² over the calibration activations X by quantizing
input-dims in order and propagating each dim's rounding error through the
inverse-Hessian Cholesky factor onto the not-yet-quantized dims.

TPU design:
- Hessian collection is one EAGER forward over the calibration batch (the
  `ops.linear` tap keys weights by object identity — no module hooks, no
  model changes; run it on CPU, eager dispatch through a remote-TPU tunnel
  is ~100x slower).
- The per-matrix solve is a jitted `lax.fori_loop` over input dims — one
  compile per weight shape, shared across the ~4 shapes in a Whisper.
- Output is a standard per-channel `QTensor` (int8_pc / int4_pack /
  int2_pack), so every existing Pallas dequant-matmul kernel serves GPTQ
  weights unchanged.
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import linear as linear_mod
from ..ops.qtensor import QTensor, pack_int_sub8
from ..models.params import named_leaves, set_leaf
from .api import LINEAR_WEIGHT_RE, _copy_tree


class _HessianTap:
    """Accumulates X^T X per tapped weight (keyed by array identity)."""

    def __init__(self, targets: dict[int, str]):
        self.targets = targets          # id(weight) -> dotted name
        self.hessians: dict[str, np.ndarray] = {}

    def observe(self, w, x) -> None:
        if isinstance(x, jax.core.Tracer):
            return                       # traced call: no data to collect
        name = self.targets.get(id(w))
        if name is None:
            return
        x2 = np.asarray(x, np.float32).reshape(-1, x.shape[-1])
        h = x2.T @ x2
        if name in self.hessians:
            self.hessians[name] += h
        else:
            self.hessians[name] = h


def collect_hessians(params: Any, run_calibration: Callable[[Any], Any],
                     name_filter: Callable[[str], bool] | None = None
                     ) -> dict[str, np.ndarray]:
    """Run `run_calibration(params)` EAGERLY (do not jit it) and return
    {weight name: X^T X} for every 2-D linear weight it touched."""
    targets: dict[int, str] = {}
    for name, leaf in named_leaves(params):
        if isinstance(leaf, QTensor) or not hasattr(leaf, "ndim"):
            continue
        if leaf.ndim != 2 or not LINEAR_WEIGHT_RE.search(name):
            continue
        if name_filter is not None and not name_filter(name):
            continue
        targets[id(leaf)] = name
    tap = _HessianTap(targets)
    prev = linear_mod._TAP
    linear_mod._TAP = tap
    try:
        run_calibration(params)
    finally:
        linear_mod._TAP = prev
    return tap.hessians


@functools.partial(jax.jit, static_argnames=("bits",))
def gptq_solve(w: jax.Array, hessian: jax.Array, bits: int = 4,
               damp: float = 0.01) -> tuple[jax.Array, jax.Array]:
    """GPTQ solve for one (K, N) weight against its (K, K) Hessian.

    Returns (q (K, N) int8 values in [-qmax, qmax], scale (1, N) f32,
    ok scalar bool — False when the Cholesky went non-finite):
    per-output-channel symmetric scales fixed from W upfront (standard
    GPTQ), input dims quantized in natural order, rounding error propagated
    via the upper-Cholesky factor of H^{-1}.
    """
    k, n = w.shape
    w = w.astype(jnp.float32)
    qmax = 2 ** (bits - 1) - 1
    scale = jnp.maximum(jnp.max(jnp.abs(w), axis=0, keepdims=True) / qmax,
                        1e-12)                      # (1, N)

    h = hessian.astype(jnp.float32)
    # dead input dims (never activated): pin the diagonal so the solve is
    # well-posed; their rows quantize plain-RTN
    diag = jnp.diag(h)
    mean_diag = jnp.maximum(jnp.mean(diag), 1e-8)
    h = h + jnp.eye(k, dtype=jnp.float32) * (damp * mean_diag)
    h = jnp.where(jnp.eye(k, dtype=bool) & (diag <= 0)[None, :] .T,
                  mean_diag, h)

    hinv = jnp.linalg.inv(h)
    hinv = (hinv + hinv.T) * 0.5  # symmetrize before Cholesky
    # Hinv = L L^T  ->  U = L^T (upper) with Hinv = U^T U
    u = jnp.linalg.cholesky(hinv).T                 # (K, K) upper
    # ill-conditioned H can make the inverse numerically non-PD, in which
    # case JAX's cholesky returns NaN SILENTLY (it never raises) — callers
    # must check `ok` and re-damp or fall back to RTN
    ok = jnp.isfinite(u).all()

    def body(i, carry):
        wc, q = carry
        w_i = wc[i]                                 # (N,)
        d = u[i, i]
        qi = jnp.clip(jnp.round(w_i / scale[0]), -qmax, qmax)
        err = (w_i - qi * scale[0]) / d
        wc = wc - u[i][:, None] * err[None, :]
        q = q.at[i].set(qi)
        return wc, q

    _, q = jax.lax.fori_loop(0, k, body, (w, jnp.zeros_like(w)))
    return q.astype(jnp.int8), scale, ok


def quantize_gptq(w: jax.Array, hessian, bits: int = 4,
                  damp: float = 0.01) -> QTensor:
    """GPTQ-quantize one weight into the standard per-channel QTensor kinds
    (int8_pc for 8-bit, packed int4/int2 otherwise) — served by the same
    Pallas kernels as RTN weights.

    Numerical guard: if the inverse-Hessian Cholesky went non-finite
    (ill-conditioned calibration), retry with 10x/100x damping; if still
    bad, fall back to plain RTN at the same per-channel scales — never
    emit NaN-derived weights silently."""
    h = jnp.asarray(hessian)
    for d in (damp, damp * 10, damp * 100):
        q, scale, ok = gptq_solve(w, h, bits=bits, damp=d)
        if bool(ok):
            break
    else:
        qmax = 2 ** (bits - 1) - 1
        wf = jnp.asarray(w, jnp.float32)
        scale = jnp.maximum(jnp.max(jnp.abs(wf), axis=0, keepdims=True)
                            / qmax, 1e-12)
        q = jnp.clip(jnp.round(wf / scale), -qmax, qmax).astype(jnp.int8)
    if bits == 8:
        return QTensor(data=q, scale=scale, kind="int8_pc", bits=8,
                       shape=tuple(w.shape))
    kind = "int4_pack" if bits == 4 else "int2_pack"
    return QTensor(data=pack_int_sub8(q.astype(jnp.int32), bits), scale=scale,
                   kind=kind, bits=bits, shape=tuple(w.shape))


def gptq_quantize_params(params: Any, run_calibration: Callable[[Any], Any],
                         bits: int = 4, damp: float = 0.01,
                         name_filter: Callable[[str], bool] | None = None
                         ) -> Any:
    """Full-model GPTQ: collect Hessians with one eager calibration pass,
    then solve every touched linear weight. Weights the calibration never
    exercised stay unquantized (they would have no Hessian)."""
    hessians = collect_hessians(params, run_calibration,
                                name_filter=name_filter)
    out = _copy_tree(params)
    for name, leaf in named_leaves(params):
        h = hessians.get(name)
        if h is None:
            continue
        set_leaf(out, name, quantize_gptq(leaf, h, bits=bits, damp=damp))
    return out
