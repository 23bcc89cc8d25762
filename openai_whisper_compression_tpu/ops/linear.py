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

from .qtensor import QTensor, dequantize


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def linear(x: jax.Array, w, b: jax.Array | None = None) -> jax.Array:
    """y = x @ w + b with quantized-weight dispatch.

    x: (..., K); w: (K, N) array or QTensor of logical shape (K, N).
    """
    if isinstance(w, QTensor):
        y = _quantized_matmul(x, w)
    else:
        y = jnp.dot(x, w.astype(x.dtype), preferred_element_type=x.dtype)
    if b is not None:
        y = y + b.astype(y.dtype)
    return y


def _quantized_matmul(x: jax.Array, q: QTensor) -> jax.Array:
    if q.kind == "int8_pc" and _on_tpu():
        from .quant_matmul import int8_matmul_pallas

        lead = x.shape[:-1]
        y = int8_matmul_pallas(x.reshape(-1, x.shape[-1]), q.data, q.scale)
        return y.reshape(*lead, -1).astype(x.dtype)
    if q.kind == "int4_pack" and _on_tpu():
        from .quant_matmul import int4_matmul_pallas

        lead = x.shape[:-1]
        y = int4_matmul_pallas(
            x.reshape(-1, x.shape[-1]), q.data, q.scale, q.in_dim
        )
        return y.reshape(*lead, -1).astype(x.dtype)
    # Reference path: XLA dequant + matmul. XLA fuses the dequant into the
    # matmul operand read, so this is already HBM-light vs fp32.
    w = dequantize(q, x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)
