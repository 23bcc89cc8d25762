"""Dense / quantized linear contraction — the single matmul entry point.

Every weight matrix in the model flows through `linear(x, w, b)`. `w` may be
a plain jnp array or a `QTensor`; quantized kinds dispatch to Pallas TPU
kernels (ops.quant_matmul) on TPU, or to an XLA dequant-matmul reference path
elsewhere. This replaces the reference's module-swap quantization backends
(quanto/bnb/torch-dynamic, reference `model_utils.py:126-134`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .qtensor import QTensor, dequantize


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


# Eager-mode activation tap (quant.gptq Hessian collection). None in
# production; when set, every eager linear() call reports (w, x) so the
# collector can accumulate per-weight X^T X. Traced calls are ignored.
_TAP = None


def linear(x: jax.Array, w, b: jax.Array | None = None) -> jax.Array:
    """y = x @ w + b with quantized-weight dispatch.

    x: (..., K); w: (K, N) array or QTensor of logical shape (K, N).
    """
    if _TAP is not None:
        _TAP.observe(w, x)
    if isinstance(w, QTensor):
        y = _quantized_matmul(x, w)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


# Below this many activation rows the matmul is HBM-weight-bandwidth-bound
# and the fused Pallas dequant kernel wins; above it (encoder-scale M) the
# matmul is MXU-compute-bound and XLA's bf16 pipeline is faster (measured on
# v5e: Pallas int8 encoder 251 ms vs XLA bf16 133 ms at M=24k, but Pallas
# wins the M<=16 decode steps).
PALLAS_M_THRESHOLD = 1024


def _quantized_matmul(x: jax.Array, q: QTensor) -> jax.Array:
    if q.act is not None:
        return _act_quant_matmul(x, q)
    m = int(np.prod(x.shape[:-1]))
    use_pallas = _on_tpu() and m <= PALLAS_M_THRESHOLD
    if q.kind == "int8_pc" and use_pallas:
        from .quant_matmul import int8_matmul_pallas

        lead = x.shape[:-1]
        y = int8_matmul_pallas(x.reshape(-1, x.shape[-1]), q.data, q.scale)
        return y.reshape(*lead, -1).astype(x.dtype)
    if q.kind == "int4_pack" and use_pallas:
        from .quant_matmul import int4_matmul_pallas

        lead = x.shape[:-1]
        y = int4_matmul_pallas(
            x.reshape(-1, x.shape[-1]), q.data, q.scale, q.in_dim
        )
        return y.reshape(*lead, -1).astype(x.dtype)
    # XLA dequant + matmul (compute-bound regime).
    w = dequantize(q, x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)


def _act_quant_matmul(x: jax.Array, q: QTensor) -> jax.Array:
    """Weight+activation integer matmul (int8 activations, int8 weights):

    - "dynamic_int8": per-row activation absmax computed at runtime
      (≈ torch `quantize_dynamic`, reference `model_utils.py:131-134`)
    - "static_int8": frozen calibration scale
      (≈ quanto static quant, reference `model_utils.py:152-214`)

    The int8×int8→int32 contraction runs natively on the MXU.
    """
    from ..quant import calibrate

    if calibrate.active():
        calibrate.observe(q, x)

    if q.kind == "int4_pack":  # w4a8: unpack nibbles to int8 for the MXU
        from .qtensor import unpack_int_sub8

        w_int = unpack_int_sub8(q.data, 4, q.in_dim).astype(jnp.int8)
    elif q.kind == "int8_pc":
        w_int = q.data
    else:
        raise ValueError(f"activation quant requires int weights, got {q.kind}")

    # NB: a fused Pallas w8a8 kernel exists (quant_matmul.w8a8_matmul_pallas,
    # measured 3.8x the bf16 rate standalone at M=24k) but measured 2.6x
    # SLOWER than this XLA chain when embedded in the full encoder at M=96k
    # (652 vs 248 ms — layout/pipelining interaction still unexplained), so
    # the XLA path stays the in-model dispatch. The XLA chain itself is at
    # parity with the weight-only bf16 path (248 vs 256 ms encoder).
    xf = x.astype(jnp.float32)
    if q.act == "dynamic_int8":
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    elif q.act == "static_int8" and q.act_scale is not None:
        sx = q.act_scale.astype(jnp.float32)
    else:  # static but not yet calibrated -> fall back to dynamic
        sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True), 1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_int,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * q.scale.astype(jnp.float32)
    return y.astype(x.dtype)
