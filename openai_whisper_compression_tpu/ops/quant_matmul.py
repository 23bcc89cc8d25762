"""Pallas TPU kernels for quantized matmuls.

Weight-only quantized inference is HBM-bandwidth-bound in the decode loop;
XLA materializes dequantized matmul operands, so a fused Pallas kernel that
reads int8/int4 weights straight from HBM and dequantizes in VMEM cuts weight
traffic 4–8× vs fp32 (the native-kernel role bnb/quanto CUDA kernels play for
the reference, `model_utils.py:126-134`).

Kernel shape: grid over (M, N) tiles with full-K operand blocks (Whisper's
K ≤ 5120 keeps every tile well inside VMEM):

    y[BM, BN] = (x[BM, K] @ dequant(w[K, BN])) * scale[BN]
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() not in ("tpu", "axon")


def _pad_dim(n: int, m: int) -> int:
    return -(-n // m) * m


def _int8_kernel(x_ref, w_ref, s_ref, o_ref):
    w = w_ref[:].astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _int4_kernel(x_ref, w_ref, s_ref, o_ref):
    # split-half packed: byte row k holds w[k] (low nibble) and w[k + K/2]
    # (high nibble). Sign extension via shift pairs only: the int8 bytes
    # sign-extend into int32, so `>> 4` IS the signed high nibble and
    # `<< 28 >> 28` the signed low one — no mask/compare/where chain.
    u = w_ref[:].astype(jnp.int32)
    lo = (u << 28) >> 28
    hi = u >> 4
    w = jnp.concatenate([lo, hi], axis=0).astype(jnp.bfloat16)
    acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w,
                  preferred_element_type=jnp.float32)
    o_ref[:] = (acc * s_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m", "block_n"))
def int8_matmul_pallas(x: jax.Array, w_int8: jax.Array, scale: jax.Array,
                       block_m: int = 256, block_n: int = 256) -> jax.Array:
    """x (M, K) float • w (K, N) int8 • scale (1, N) -> (M, N) in x.dtype."""
    m, k = x.shape
    kw, n = w_int8.shape
    assert kw == k
    bm = min(block_m, _pad_dim(m, 16))
    bn = min(block_n, _pad_dim(n, 128))
    mp, np_, kp = _pad_dim(m, bm), _pad_dim(n, bn), _pad_dim(k, 128)
    x_p = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    w_p = jnp.pad(w_int8, ((0, kp - k), (0, np_ - n)))
    s_p = jnp.pad(scale.reshape(1, -1), ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        _int8_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, kp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x_p, w_p, s_p)
    return out[:m, :n]


@functools.partial(jax.jit, static_argnames=("k", "block_m", "block_n"))
def int4_matmul_pallas(x: jax.Array, w_packed: jax.Array, scale: jax.Array,
                       k: int, block_m: int = 256,
                       block_n: int = 256) -> jax.Array:
    """x (M, K) float • packed w (K/2, N) int8 (split-half int4) • scale
    (1, N) -> (M, N)."""
    m, kx = x.shape
    assert kx == k and w_packed.shape[0] == k // 2
    n = w_packed.shape[1]
    bm = min(block_m, _pad_dim(m, 16))
    bn = min(block_n, _pad_dim(n, 128))
    # pad K/2 to a multiple of 128 so both halves stay aligned
    kh = k // 2
    khp = _pad_dim(kh, 128)
    mp, np_ = _pad_dim(m, bm), _pad_dim(n, bn)
    # x halves must match the unpacked concat order [0:kh | kh:k] + padding
    x_lo = jnp.pad(x[:, :kh], ((0, mp - m), (0, khp - kh)))
    x_hi = jnp.pad(x[:, kh:], ((0, mp - m), (0, khp - kh)))
    x_p = jnp.concatenate([x_lo, x_hi], axis=1)  # (mp, 2*khp)
    w_p = jnp.pad(w_packed, ((0, khp - kh), (0, np_ - n)))
    s_p = jnp.pad(scale.reshape(1, -1), ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        _int4_kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, 2 * khp), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((khp, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * 2 * khp,
            bytes_accessed=mp * khp * 4 + khp * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x_p, w_p, s_p)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Blockwise 4-bit codebook (NF4/FP4) and group-asymmetric (HQQ) dequant-
# matmuls. These are the TPU-native stand-ins for the bnb/HQQ CUDA kernels
# the reference leans on (`model_utils.py:44-73`,
# `bnb_implementation.py:1093-1119`): in the HBM-bandwidth-bound decode
# regime the weight stream is the cost, so dequant (codebook select /
# zero-point affine, VPU) fuses in front of the MXU contraction and the
# 4-bit HBM read is the win. Layouts produced by quant.core: indices/values
# nibble-packed split-half along K (same as int4_pack), per-group params
# (K//G, N) with groups along K.
# ---------------------------------------------------------------------------


def _codebook_select(idx: jax.Array, code: tuple[float, ...]) -> jax.Array:
    """16-way vectorized lookup as a select chain (no gather on the VPU)."""
    from .qtensor import codebook_select

    return codebook_select(idx, code)


def _unpack_nibbles(w_ref, signed: bool) -> jax.Array:
    """(KH, BN) packed byte block -> (2*KH, BN) int32 values, split-half
    order restored to the original K order by the concat."""
    u = w_ref[:].astype(jnp.int32) & 0xFF
    lo = u & 0xF
    hi = (u >> 4) & 0xF
    if signed:
        lo = jnp.where(lo >= 8, lo - 16, lo)
        hi = jnp.where(hi >= 8, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=0)


def _make_nf4_kernel(code: tuple[float, ...], g: int):
    def kernel(x_ref, w_ref, s_ref, o_ref):
        idx = _unpack_nibbles(w_ref, signed=False)            # (K, BN)
        w = _codebook_select(idx, code)
        kp, bn = w.shape
        s = s_ref[:].astype(jnp.float32)                      # (K//G, BN)
        w = (w.reshape(kp // g, g, bn) * s[:, None, :]).reshape(kp, bn)
        acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)
    return kernel


def _make_group_asym_kernel(g: int, packed: bool):
    def kernel(x_ref, w_ref, s_ref, z_ref, o_ref):
        if packed:
            vals = _unpack_nibbles(w_ref, signed=False).astype(jnp.float32)
        else:
            # (K, BN) uint8 values arrive bitcast to int8 (Mosaic has no
            # uint8->f32 cast); recover [0, 255] via int32 masking
            vals = (w_ref[:].astype(jnp.int32) & 0xFF).astype(jnp.float32)
        kp, bn = vals.shape
        s = s_ref[:].astype(jnp.float32)                      # (K//G, BN)
        z = z_ref[:].astype(jnp.float32)
        w = ((vals.reshape(kp // g, g, bn) - z[:, None, :]) * s[:, None, :]
             ).reshape(kp, bn)
        acc = jnp.dot(x_ref[:].astype(jnp.bfloat16), w.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
        o_ref[:] = acc.astype(o_ref.dtype)
    return kernel


def blockwise4_pallas_ok(k: int, block_size: int) -> bool:
    """The split-half packed layout admits no K padding between the halves:
    the kernel needs K/2 to be lane-tileable (multiple of 128) and K to
    divide into scale groups. Holds for every projection of whisper
    base/small/medium/large (K ∈ {512, 768, 1024, 1280, 2048..5120});
    whisper-tiny's d_model=384 and tiny test dims fall back to the XLA
    dequant path (which shares the gather-free codebook_select)."""
    return k % 256 == 0 and k % block_size == 0


@functools.partial(jax.jit,
                   static_argnames=("kind", "k", "g", "block_m", "block_n"))
def nf4_matmul_pallas(x: jax.Array, w_packed: jax.Array, scale: jax.Array,
                      kind: str, k: int, g: int, block_m: int = 256,
                      block_n: int = 256) -> jax.Array:
    """x (M, K) float • packed nf4/fp4 indices (K/2, N) int8 • effective
    block scale (K/G, N) float -> (M, N) in x.dtype."""
    from .qtensor import FP4_CODE, NF4_CODE

    m, kx = x.shape
    kh = k // 2
    assert kx == k and w_packed.shape[0] == kh and kh % 128 == 0
    n = w_packed.shape[1]
    bm = min(block_m, _pad_dim(m, 16))
    bn = min(block_n, _pad_dim(n, 128))
    mp, np_ = _pad_dim(m, bm), _pad_dim(n, bn)
    # split-half x to match the unpacked concat order (no K padding: kh is
    # already lane-tileable, enforced by blockwise4_pallas_ok)
    x_p = jnp.pad(x, ((0, mp - m), (0, 0)))
    w_p = jnp.pad(w_packed, ((0, 0), (0, np_ - n)))
    s_p = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, np_ - n)))
    code = tuple(float(c) for c in
                 (NF4_CODE if kind == "nf4" else FP4_CODE))

    out = pl.pallas_call(
        _make_nf4_kernel(code, g),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + kh * np_ + (k // g) * np_ * 4
            + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x_p, w_p, s_p)
    return out[:m, :n]


@functools.partial(jax.jit,
                   static_argnames=("k", "g", "block_m", "block_n"))
def group_asym_matmul_pallas(x: jax.Array, w_data: jax.Array,
                             scale: jax.Array, zero: jax.Array,
                             k: int, g: int, block_m: int = 256,
                             block_n: int = 256) -> jax.Array:
    """x (M, K) float • HQQ group-asym values ((K/2, N) packed nibbles or
    (K, N) uint8) • scale/zero (K/G, N) -> (M, N) in x.dtype."""
    m, kx = x.shape
    assert kx == k
    packed = w_data.shape[0] != k
    if packed:
        assert w_data.shape[0] == k // 2 and (k // 2) % 128 == 0
    n = w_data.shape[1]
    bm = min(block_m, _pad_dim(m, 16))
    bn = min(block_n, _pad_dim(n, 128))
    mp, np_ = _pad_dim(m, bm), _pad_dim(n, bn)
    x_p = jnp.pad(x, ((0, mp - m), (0, 0)))
    if w_data.dtype == jnp.uint8:  # Mosaic can't cast uint8 in-kernel
        w_data = w_data.view(jnp.int8)
    w_p = jnp.pad(w_data, ((0, 0), (0, np_ - n)))
    s_p = jnp.pad(scale.astype(jnp.float32), ((0, 0), (0, np_ - n)))
    z_p = jnp.pad(zero.astype(jnp.float32), ((0, 0), (0, np_ - n)))

    out = pl.pallas_call(
        _make_group_asym_kernel(g, packed),
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm, np_ // bn),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w_data.shape[0], bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k // g, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * k,
            bytes_accessed=mp * k * 2 + w_data.shape[0] * np_
            + 2 * (k // g) * np_ * 4 + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(x_p, w_p, s_p, z_p)
    return out[:m, :n]


# ---------------------------------------------------------------------------
# Fused w8a8 matmul: activation int8-quantization + int8×int8 MXU contraction
# + dequant epilogue in ONE kernel. This is what makes the reference's
# dynamic/static activation-quant configs (`torch.quantization.quantize_dynamic`
# at `model_utils.py:131-134`; quanto static at `model_utils.py:152-214`)
# actually FAST on TPU: XLA's staged act-quant chain measured ~1.8 ms for a
# (24k, 768)x(768, 3072) layer vs 0.6 ms bf16; this kernel runs it in
# ~0.16 ms (int8 MXU rate, quantization fused on the VPU while the MXU works).
# ---------------------------------------------------------------------------


def _w8a8_kernel(x_ref, w_ref, sw_ref, o_ref):
    xf = x_ref[:].astype(jnp.float32)
    sx = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                     1e-12) / 127.0
    xq = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx
                * sw_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def _w8a8_static_kernel(x_ref, w_ref, sw_ref, sx_ref, o_ref):
    sx = sx_ref[0, 0].astype(jnp.float32)
    xq = jnp.clip(jnp.round(x_ref[:].astype(jnp.float32) / sx),
                  -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(xq, w_ref[:], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    o_ref[:] = (acc.astype(jnp.float32) * sx
                * sw_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_m",))
def w8a8_matmul_pallas(x: jax.Array, w_int8: jax.Array, w_scale: jax.Array,
                       act_scale: jax.Array | None = None,
                       block_m: int = 128) -> jax.Array:
    """x (M, K) float • w (K, N) int8 • w_scale (1, N) -> (M, N) in x.dtype.

    act_scale None: dynamic per-row absmax activation quantization (fused).
    act_scale scalar: frozen calibrated scale (static quant semantics).
    The whole (K, N) weight stays VMEM-resident across M blocks.
    """
    m, k = x.shape
    kw, n = w_int8.shape
    assert kw == k
    bm = min(block_m, _pad_dim(m, 16))
    mp, kp, np_ = _pad_dim(m, bm), _pad_dim(k, 128), _pad_dim(n, 128)
    x_p = jnp.pad(x, ((0, mp - m), (0, kp - k)))
    w_p = jnp.pad(w_int8, ((0, kp - k), (0, np_ - n)))
    s_p = jnp.pad(w_scale.reshape(1, -1), ((0, 0), (0, np_ - n)))

    in_specs = [
        pl.BlockSpec((bm, kp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((kp, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, np_), lambda i: (0, 0), memory_space=pltpu.VMEM),
    ]
    operands = [x_p, w_p, s_p]
    kernel = _w8a8_kernel
    if act_scale is not None:
        in_specs.append(pl.BlockSpec((1, 1), lambda i: (0, 0),
                                     memory_space=pltpu.SMEM))
        operands.append(jnp.asarray(act_scale, jnp.float32).reshape(1, 1))
        kernel = _w8a8_static_kernel

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((mp, np_), x.dtype),
        grid=(mp // bm,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bm, np_), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * mp * np_ * kp,
            bytes_accessed=mp * kp * 2 + kp * np_ + mp * np_ * 2,
            transcendentals=0),
        interpret=_interpret(),
    )(*operands)
    return out[:m, :n]
