"""Weight quantizers: pure functions `dense (K,N) -> QTensor`.

TPU-native replacements for the reference's quantization backends
(`model_utils.py:24-149`):

- int8/int4/int2 per-channel symmetric  ≈ optimum-quanto qint8/qint4/qint2
- NF4/FP4 blockwise + double-quant      ≈ bitsandbytes Linear4bit
- group-wise asymmetric HQQ int3/4/8    ≈ HQQ (`_create_hqq_config`, :52-73)
- fp8 (e4m3)                            ≈ quanto qfloat8
- dynamic / static int8 activations     ≈ torch PTDQ / quanto Calibration

All solves are pure jnp math (jit-able); packing layouts are chosen for
in-kernel unpack on TPU (split-half packing: no interleave needed).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.qtensor import FP4_CODE, NF4_CODE, QTensor, pack_int_sub8

# Every quantizer is jitted (static config args) so repeated application over
# a model's many same-shaped weight leaves compiles once per shape — matters
# on remote/tunnelled TPU backends where eager dispatch is expensive.


@jax.jit
def quantize_int8(w: jax.Array) -> QTensor:
    """Per-output-channel symmetric int8."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)  # (1, N)
    scale = jnp.maximum(absmax / 127.0, 1e-12)
    data = jnp.clip(jnp.round(w / scale), -127, 127).astype(jnp.int8)
    return QTensor(data=data, scale=scale, kind="int8_pc", bits=8,
                   shape=tuple(w.shape))


@functools.partial(jax.jit, static_argnames=("bits",))
def quantize_int_sub8(w: jax.Array, bits: int) -> QTensor:
    """Per-output-channel symmetric int4/int2, split-half packed along K."""
    assert bits in (2, 4)
    w = w.astype(jnp.float32)
    qmax = 2 ** (bits - 1) - 1  # 7 or 1
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(absmax / qmax, 1e-12)
    q = jnp.clip(jnp.round(w / scale), -qmax, qmax).astype(jnp.int32)
    data = pack_int_sub8(q, bits)
    return QTensor(data=data, scale=scale,
                   kind="int4_pack" if bits == 4 else "int2_pack",
                   bits=bits, shape=tuple(w.shape))


def _codebook_assign(w_norm: jax.Array, code: jax.Array) -> jax.Array:
    """Nearest codebook index per element (w_norm in [-1, 1])."""
    d = jnp.abs(w_norm[..., None] - code[None, :])
    return jnp.argmin(d, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("block_size", "double_quant", "kind"))
def quantize_nf4(w: jax.Array, block_size: int = 64,
                 double_quant: bool = False, kind: str = "nf4") -> QTensor:
    """Blockwise 4-bit codebook quantization (NF4 or FP4), bnb-style.

    Blocks of `block_size` run along K per output column (the matmul
    contraction axis — kernel-friendly, unlike bnb's flattened row-major
    blocks; same compression ratio); per-block absmax scale (K//G, N);
    indices nibble-pack split-half along K into (K//2, N), the same layout
    as int4_pack so the Pallas dequant-matmul reads them directly. Optional
    double-quant stores the scales as int8 with a second-level scale/offset
    per 256 scales (reference enables this via `bnb_4bit_use_double_quant`,
    `model_utils.py:44-49`).
    """
    assert kind in ("nf4", "fp4")
    k, n = w.shape
    g = block_size
    assert k % g == 0, f"K={k} not divisible by block {g}"
    wf = w.astype(jnp.float32).reshape(k // g, g, n)
    absmax = jnp.maximum(jnp.max(jnp.abs(wf), axis=1), 1e-12)      # (K//G, N)
    code = jnp.asarray(NF4_CODE if kind == "nf4" else FP4_CODE)
    idx = _codebook_assign(wf / absmax[:, None, :], code).reshape(k, n)
    data = pack_int_sub8(idx, 4)                                   # (K//2, N)

    scale2 = offset2 = None
    scale = absmax
    if double_quant:
        # quantize the fp32 absmax scales to int8 per 256-group (flattened
        # row-major over (K//G, N)); store second-level params expanded
        # elementwise so dequant is one fused multiply-add
        dq = 256
        flat = absmax.reshape(-1)
        padg = (-flat.size) % dq
        s = jnp.pad(flat, (0, padg))
        groups = s.reshape(-1, dq)
        off = jnp.mean(groups, axis=1, keepdims=True)
        centered = groups - off
        s2 = jnp.maximum(jnp.max(jnp.abs(centered), axis=1, keepdims=True),
                         1e-12) / 127.0
        q = jnp.clip(jnp.round(centered / s2), -127, 127).astype(jnp.int8)
        scale = q.reshape(-1)[: flat.size].reshape(absmax.shape)
        scale2 = jnp.repeat(s2.reshape(-1), dq)[: flat.size].reshape(absmax.shape)
        offset2 = jnp.repeat(off.reshape(-1), dq)[: flat.size].reshape(absmax.shape)
    return QTensor(data=data, scale=scale, scale2=scale2, offset2=offset2,
                   kind=kind, bits=4, shape=(k, n), block_size=block_size)


@functools.partial(jax.jit, static_argnames=("bits", "group_size", "iters",
                                            "lp_norm", "beta", "kappa"))
def quantize_hqq(w: jax.Array, bits: int = 4, group_size: int = 64,
                 iters: int = 20, lp_norm: float = 0.7,
                 beta: float = 10.0, kappa: float = 1.01) -> QTensor:
    """Half-Quadratic Quantization: group-wise asymmetric int with the zero
    point optimized by alternating half-quadratic solves (generalized
    lp<1-norm shrinkage on the residual). Pure jnp — the whole solve jits.

    Replaces the HQQ backend the reference configures at
    `model_utils.py:52-73` (int3/int4/int8, group_size 64).
    """
    k, n = w.shape
    assert k % group_size == 0, f"K={k} not divisible by group={group_size}"
    wf = w.astype(jnp.float32).reshape(k // group_size, group_size, n)
    qmax = 2.0 ** bits - 1.0

    wmin = jnp.min(wf, axis=1, keepdims=True)
    wmax = jnp.max(wf, axis=1, keepdims=True)
    scale = jnp.maximum((wmax - wmin) / qmax, 1e-8)  # (G, 1, N)
    zero = -wmin / scale

    def shrink(x, beta):
        # generalized soft-threshold for |x|^p, p<1 (HQQ's prox operator)
        return jnp.sign(x) * jnp.maximum(
            jnp.abs(x) - (lp_norm / beta) * jnp.power(
                jnp.maximum(jnp.abs(x), 1e-8), lp_norm - 1.0), 0.0)

    def body(carry, _):
        zero, beta = carry
        q = jnp.clip(jnp.round(wf / scale + zero), 0, qmax)
        e = shrink(wf - (q - zero) * scale, beta)
        zero = jnp.mean(q - (wf - e) / scale, axis=1, keepdims=True)
        return (zero, beta * kappa), None

    (zero, _), _ = jax.lax.scan(body, (zero, beta), None, length=iters)
    q = jnp.clip(jnp.round(wf / scale + zero), 0, qmax)

    q = q.reshape(k, n)
    if bits <= 4:
        # nibble-pack split-half along K (3-bit values occupy a nibble):
        # halves storage vs byte-per-weight AND feeds the Pallas
        # group-asym dequant-matmul the same layout as int4/nf4
        data = pack_int_sub8(q.astype(jnp.int32), 4)   # (K//2, N) int8
    else:
        data = q.astype(jnp.uint8)  # b-bit unsigned values (0..2^b-1)
    return QTensor(data=data,
                   scale=scale.reshape(k // group_size, n),
                   zero=zero.reshape(k // group_size, n),
                   kind="group_asym", bits=bits, shape=(k, n),
                   block_size=group_size)


@jax.jit
def quantize_fp8(w: jax.Array) -> QTensor:
    """float8_e4m3 weights with per-channel scale into the fp8 dynamic range."""
    w = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w), axis=0, keepdims=True)
    scale = jnp.maximum(absmax / 448.0, 1e-12)  # e4m3 max normal = 448
    data = (w / scale).astype(jnp.float8_e4m3fn)
    return QTensor(data=data, scale=scale, kind="fp8", bits=8,
                   shape=tuple(w.shape))


QUANTIZERS = {
    "int8": quantize_int8,
    "int4": lambda w: quantize_int_sub8(w, 4),
    "int2": lambda w: quantize_int_sub8(w, 2),
    "nf4": lambda w, **kw: quantize_nf4(w, kind="nf4", **kw),
    "nf4_dq": lambda w, **kw: quantize_nf4(w, kind="nf4", double_quant=True, **kw),
    "fp4": lambda w, **kw: quantize_nf4(w, kind="fp4", **kw),
    "fp4_dq": lambda w, **kw: quantize_nf4(w, kind="fp4", double_quant=True, **kw),
    "hqq_int3": lambda w: quantize_hqq(w, bits=3),
    "hqq_int4": lambda w: quantize_hqq(w, bits=4),
    "hqq_int8": lambda w: quantize_hqq(w, bits=8, group_size=128),
    "fp8": quantize_fp8,
}
