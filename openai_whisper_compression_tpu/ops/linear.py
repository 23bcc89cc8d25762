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
# wins the M<=16 decode steps). Resolution order: OWC_PALLAS_M_THRESHOLD env
# > per-device-kind table > default. `measure_pallas_crossover()` re-measures
# on the attached chip (bench.py --tune-threshold).
PALLAS_M_DEFAULT = 1024
# device_kind -> measured crossover (bench.py --tune-threshold output)
PALLAS_M_TABLE: dict[str, int] = {
    "TPU v5 lite": 1024,
}
_resolved_threshold: int | None = None


def pallas_m_threshold() -> int:
    """Lazily resolve the Pallas-vs-XLA dispatch crossover for this process."""
    global _resolved_threshold
    if _resolved_threshold is None:
        import os

        env = os.environ.get("OWC_PALLAS_M_THRESHOLD")
        if env:
            _resolved_threshold = int(env)
        else:
            try:
                kind = jax.devices()[0].device_kind
            except Exception:
                kind = ""
            _resolved_threshold = PALLAS_M_TABLE.get(kind, PALLAS_M_DEFAULT)
    return _resolved_threshold


def measure_pallas_crossover(k: int = 768, n: int = 3072,
                             candidates: tuple[int, ...] = (
                                 64, 128, 256, 512, 1024, 2048, 4096),
                             iters: int = 10) -> int:
    """Measure the largest M where the fused Pallas int8 kernel still beats
    the XLA dequant+matmul on the attached device, and install it as this
    process's threshold. One-time cost: ~2 compiles per candidate M."""
    import time

    from .quant_matmul import int8_matmul_pallas

    global _resolved_threshold
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
    q = jnp.clip(jnp.round(w / (jnp.max(jnp.abs(w), axis=0, keepdims=True)
                                / 127.0)), -127, 127).astype(jnp.int8)
    s = (jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0)

    # q/s must be ARGUMENTS, not closure constants — a closed-over weight
    # gets its dequant constant-folded at trace time and the "XLA path"
    # degenerates to a prematerialized bf16 matmul.
    xla = jax.jit(lambda x, q, s: jnp.dot(
        x, q.astype(jnp.bfloat16) * s.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32))

    def timeit(f, x):
        f(x).block_until_ready()
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f(x)
        r.block_until_ready()
        return (time.perf_counter() - t0) / iters

    # NB on tunnelled backends (axon) per-call dispatch (~0.5 ms RTT)
    # dominates mid-size M and flattens the curve; the in-model anchor
    # points remain decisive (Pallas wins M<=64 decode, XLA wins M>=24k
    # encoder — DESIGN.md §3). This tool is for future device kinds where
    # dispatch is local.
    best = candidates[0]
    for m in candidates:
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        t_pal = timeit(lambda x: int8_matmul_pallas(x, q, s), x)
        t_xla = timeit(lambda x: xla(x, q, s), x)
        if t_pal <= t_xla:
            best = m
        else:
            break
    _resolved_threshold = best
    return best


def _quantized_matmul(x: jax.Array, q: QTensor) -> jax.Array:
    if q.act is not None:
        return _act_quant_matmul(x, q)
    m = int(np.prod(x.shape[:-1]))
    use_pallas = _on_tpu() and m <= pallas_m_threshold()
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
    if q.kind in ("nf4", "fp4") and use_pallas:
        from .qtensor import _effective_block_scale
        from .quant_matmul import blockwise4_pallas_ok, nf4_matmul_pallas

        if blockwise4_pallas_ok(q.in_dim, q.block_size):
            lead = x.shape[:-1]
            scale = _effective_block_scale(q, jnp.float32)  # (K/G, N), tiny
            y = nf4_matmul_pallas(x.reshape(-1, x.shape[-1]), q.data, scale,
                                  q.kind, q.in_dim, q.block_size)
            return y.reshape(*lead, -1).astype(x.dtype)
    if q.kind == "group_asym" and use_pallas:
        from .quant_matmul import blockwise4_pallas_ok, group_asym_matmul_pallas

        packed = q.data.shape[0] != q.in_dim
        if (blockwise4_pallas_ok(q.in_dim, q.block_size) if packed
                else q.in_dim % q.block_size == 0):
            lead = x.shape[:-1]
            y = group_asym_matmul_pallas(x.reshape(-1, x.shape[-1]), q.data,
                                         q.scale, q.zero, q.in_dim,
                                         q.block_size)
            return y.reshape(*lead, -1).astype(x.dtype)
    # XLA dequant + matmul (compute-bound regime).
    w = dequantize(q, x.dtype)
    return jnp.dot(x, w, preferred_element_type=x.dtype)


def _act_quant_matmul(x: jax.Array, q: QTensor) -> jax.Array:
    """Weight+activation quantized matmul:

    - "dynamic_int8": per-row activation absmax computed at runtime
      (≈ torch `quantize_dynamic`, reference `model_utils.py:131-134`)
    - "static_int8": frozen calibration scale
      (≈ quanto static quant, reference `model_utils.py:152-214`)
    - "static_fp8": activations cast to float8_e4m3 with a frozen scale
      (≈ quanto float8 activations, the act_quant="float8" half of the
      static matrix, reference `static_quantization.py:75-107`). v5e's MXU
      has no fp8 mode, so the contraction upcasts to bf16 — the fp8
      round-trip bakes in the quantization error and halves activation
      storage; throughput matches the bf16 path.

    The int8×int8→int32 contraction runs natively on the MXU; int8
    activations over non-int weights (float8 weights × int8 acts in the
    reference matrix) bake the activation error and contract in bf16.
    """
    from ..quant import calibrate

    if calibrate.active():
        calibrate.observe(q, x)

    if q.act == "static_fp8":
        xf = x.astype(jnp.float32)
        if q.act_scale is not None:
            sx = q.act_scale.astype(jnp.float32)
        else:  # uncalibrated -> dynamic per-row scale
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                             1e-12) / 448.0  # e4m3 max normal
        # e4m3fn has no inf: values past the frozen absmax would convert to
        # NaN, so saturate like the int8 path clips to [-127, 127]
        x8 = jnp.clip(xf / sx, -448.0, 448.0).astype(jnp.float8_e4m3fn)
        w = dequantize(q, jnp.bfloat16)
        y = jnp.dot(x8.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        return (y * sx).astype(x.dtype)

    if q.kind == "int4_pack":  # w4a8: unpack nibbles to int8 for the MXU
        from .qtensor import unpack_int_sub8

        w_int = unpack_int_sub8(q.data, 4, q.in_dim).astype(jnp.int8)
    elif q.kind == "int8_pc":
        w_int = q.data
    else:
        # int8 activations over a non-int weight kind (e.g. fp8 weights ×
        # int8 acts): bake the activation error, contract in bf16.
        xf = x.astype(jnp.float32)
        if q.act == "static_int8" and q.act_scale is not None:
            sx = q.act_scale.astype(jnp.float32)
        else:
            sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=-1, keepdims=True),
                             1e-12) / 127.0
        xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
        w = dequantize(q, jnp.bfloat16)
        y = jnp.dot(xq.astype(jnp.bfloat16), w,
                    preferred_element_type=jnp.float32)
        return (y * sx).astype(x.dtype)

    # NB: a fused Pallas w8a8 kernel exists (quant_matmul.w8a8_matmul_pallas)
    # and WINS standalone at every M (M=96k: 2.79 ms vs 3.11 XLA), yet loses
    # in-model. Root cause (measured ladder, v5e, DESIGN.md §8): the
    # inversion is a COMPOSITION effect, not kernel arithmetic. Each
    # pallas_call is an opaque fusion boundary — XLA can no longer fuse the
    # surrounding layernorm/GELU/residual elementwise work and the dynamic
    # activation-quant reduce into the matmul pipeline, so each becomes its
    # own HBM pass, and 3-D (B,S,K) operands pay a relayout copy at the
    # reshape boundary. Ladder at M=96k: standalone 2-D Pallas wins
    # 2.79→3.11; ffn chain in one jit, 2-D: 9.68 vs 8.92 (-8%); same chain
    # with 3-D acts + per-call reshape: 11.08 vs 9.09 (-22%); full encoder
    # (72 matmuls, all boundaries): 658 vs 264 ms (-2.5x). The XLA path
    # therefore stays the in-model dispatch (test_quant.py pins it); the XLA
    # chain itself is at parity with weight-only bf16 (248 vs 256 ms).
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
