"""QTensor — a quantized-weight pytree node.

The compression layer of the reference swaps `nn.Linear` modules for
quanto/bnb/hqq quantized modules (reference `model_utils.py:126-134`,
`bnb_implementation.py:1093-1119`). TPU-native design: weights are plain
pytree leaves, so a *quantized weight* is just a different pytree node that
`ops.linear` knows how to contract with. Quantization is then a pure function
`params -> params'` and the same model code runs unchanged.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

# NF4 codebook (the 16 NormalFloat4 levels used by bitsandbytes-style 4-bit
# blockwise quantization; reference consumes it via `BitsAndBytesConfig`
# `bnb_4bit_quant_type="nf4"` at `model_utils.py:44-49`). Values are the
# standard published NF4 quantiles.
NF4_CODE = np.array(
    [
        -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
        -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
        0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
        0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
        0.7229568362236023, 1.0,
    ],
    dtype=np.float32,
)

# FP4 (e2m1) codebook as used by bnb fp4 quant type.
FP4_CODE = np.array(
    [0.0, 0.0052083334, 0.6666667, 1.0, 0.3333333, 0.5, 0.16666667, 0.25,
     -0.0, -0.0052083334, -0.6666667, -1.0, -0.3333333, -0.5, -0.16666667,
     -0.25],
    dtype=np.float32,
)


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class QTensor:
    """A quantized 2-D weight of logical shape (in_dim, out_dim).

    kind (static):
      - "int8_pc": per-output-channel symmetric int8. data:(K,N) int8,
        scale:(1,N).
      - "int4_pack": per-channel symmetric int4 packed 2/byte along K.
        data:(K//2,N) int8 (low nibble = even k, high nibble = odd k),
        scale:(1,N).
      - "int2_pack": per-channel symmetric int2 packed 4/byte along K.
      - "nf4" / "fp4": blockwise codebook 4-bit. Blocks run along K per
        output column (kernel-friendly: the contraction axis), packed
        split-half like int4_pack. data:(K//2,N) int8 nibble-packed
        codebook indices, scale:(K//G,N) per-block absmax. With
        double-quant, scale is int8 and scale2/offset2 hold the
        elementwise-expanded second-level scale/offset (same shape).
      - "group_asym": group-wise asymmetric int (HQQ-style, reference
        `model_utils.py:52-73`). scale/zero:(K//G, N). data:(K,N) uint8
        for bits == 8; for bits <= 4 the values nibble-pack split-half
        along K into (K//2, N) int8 (3-bit values occupy a nibble).
      - "fp8": float8_e4m3 weights with per-channel scale.
    """

    data: jax.Array
    scale: jax.Array
    zero: jax.Array | None = None
    scale2: jax.Array | None = None   # double-quant second-level scale
    offset2: jax.Array | None = None  # double-quant second-level offset
    act_scale: jax.Array | None = None  # static activation-quant scale
    kind: str = dataclasses.field(default="int8_pc", metadata=dict(static=True))
    bits: int = dataclasses.field(default=8, metadata=dict(static=True))
    shape: tuple = dataclasses.field(default=(), metadata=dict(static=True))
    block_size: int = dataclasses.field(default=64, metadata=dict(static=True))
    # activation mode: None (weight-only) | "dynamic_int8" | "static_int8"
    act: str | None = dataclasses.field(default=None, metadata=dict(static=True))
    meta: Any = dataclasses.field(default=None, metadata=dict(static=True))

    @property
    def in_dim(self) -> int:
        return self.shape[0]

    @property
    def out_dim(self) -> int:
        return self.shape[1]

    def nbytes(self) -> int:
        n = self.data.size * self.data.dtype.itemsize
        for t in (self.scale, self.zero, self.scale2, self.offset2,
                  self.act_scale):
            if t is not None:
                n += t.size * t.dtype.itemsize
        return n


def is_qtensor(x: Any) -> bool:
    return isinstance(x, QTensor)


def dequantize(q: QTensor, dtype=jnp.float32) -> jax.Array:
    """Reference (XLA, non-Pallas) dequantization to a dense (K, N) array."""
    k, n = q.shape
    if q.kind == "int8_pc":
        w = q.data.astype(dtype) * q.scale.astype(dtype)
    elif q.kind in ("int4_pack", "int2_pack"):
        w = unpack_int_sub8(q.data, q.bits, k).astype(dtype) * q.scale.astype(dtype)
    elif q.kind in ("nf4", "fp4"):
        code = NF4_CODE if q.kind == "nf4" else FP4_CODE
        idx = unpack_int_sub8(q.data, 4, k, signed=False)  # (K, N) in [0,16)
        vals = codebook_select(idx, code).astype(dtype)
        g = q.block_size
        scale = _effective_block_scale(q, dtype)           # (K//G, N)
        w = (vals.reshape(k // g, g, n) * scale[:, None, :]).reshape(k, n)
    elif q.kind == "group_asym":
        g = q.block_size
        vals = (q.data.astype(dtype) if q.data.shape[0] == k
                else unpack_int_sub8(q.data, 4, k, signed=False).astype(dtype))
        w = vals.reshape(k // g, g, n)
        w = (w - q.zero.astype(dtype)[:, None, :]) * q.scale.astype(dtype)[:, None, :]
        w = w.reshape(k, n)
    elif q.kind == "fp8":
        w = q.data.astype(dtype) * q.scale.astype(dtype)
    else:
        raise ValueError(f"unknown QTensor kind {q.kind!r}")
    return w


def _effective_block_scale(q: QTensor, dtype) -> jax.Array:
    """Per-block absmax scale, undoing double-quant if present."""
    scale = q.scale
    if q.scale2 is not None:
        scale = scale.astype(dtype) * q.scale2.astype(dtype) + q.offset2.astype(dtype)
    return scale.astype(dtype)


def codebook_select(idx: jax.Array, code: tuple[float, ...] | jax.Array,
                    dtype=jnp.float32) -> jax.Array:
    """16-way codebook lookup as a binary select tree.

    `code[idx]` lowers to a gather, which TPUs execute element-by-element;
    lane-wide selects stay on the VPU's full width (and Mosaic has no
    gather at all, so the Pallas kernels share this). The bit-tree form
    costs 4 bit-tests + 15 selects = 19 full-width ops vs the naive
    equality chain's 15 compares + 15 selects = 30."""
    code = tuple(float(c) for c in code)
    assert len(code) == 16
    bits = [(idx & (1 << b)) != 0 for b in range(4)]
    lvl = [jnp.where(bits[0], jnp.asarray(code[2 * i + 1], dtype),
                     jnp.asarray(code[2 * i], dtype)) for i in range(8)]
    for b in (1, 2, 3):
        lvl = [jnp.where(bits[b], lvl[2 * i + 1], lvl[2 * i])
               for i in range(len(lvl) // 2)]
    return lvl[0]


def pack_int_sub8(w_int: jax.Array, bits: int) -> jax.Array:
    """Pack sub-byte signed ints along axis 0 into int8, **split-half layout**:
    byte[k] holds w[k], w[k + K/p], w[k + 2K/p], ... in its bit groups
    (p = 8/bits values per byte). Unpacking is then slice+concat with no
    interleave — cheap on the TPU VPU (lane-preserving).
    """
    per = 8 // bits
    k, n = w_int.shape
    assert k % per == 0, f"K={k} not divisible by {per}"
    u = (w_int.astype(jnp.int32) & ((1 << bits) - 1)).reshape(per, k // per, n)
    shifts = jnp.arange(per, dtype=jnp.int32) * bits
    packed = jnp.sum(u << shifts[:, None, None], axis=0)
    return packed.astype(jnp.uint8).view(jnp.int8)


def unpack_int_sub8(packed: jax.Array, bits: int, k: int,
                    signed: bool = True) -> jax.Array:
    """Inverse of pack_int_sub8 → (K, N) int32, sign-extended when signed
    (codebook indices / asymmetric values unpack unsigned)."""
    per = 8 // bits
    u = packed.view(jnp.uint8).astype(jnp.int32)  # (K//per, N)
    mask = (1 << bits) - 1
    sign_bit = 1 << (bits - 1)
    parts = []
    for j in range(per):
        vals = (u >> (bits * j)) & mask
        if signed:
            vals = jnp.where(vals >= sign_bit, vals - (1 << bits), vals)
        parts.append(vals)
    return jnp.concatenate(parts, axis=0)
