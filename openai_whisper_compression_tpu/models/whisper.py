"""Functional JAX Whisper encoder/decoder.

TPU-native re-design of the model the reference consumes from HF
`WhisperForConditionalGeneration` (reference `model_utils.py:116-123`,
`data_utils.py:152`): pure functions over a parameter pytree, everything
static-shape and jit-traceable, all matmuls routed through `ops.linear`
(which dispatches dense vs Pallas-quantized weights).

Numerical semantics match HF exactly (pre-LN, q scaled by head_dim**-0.5,
k_proj without bias, exact-erf GELU, layer_norm eps 1e-5, sin|cos concat
encoder positions, learned decoder positions, proj_out tied to embed_tokens)
— verified by tests/test_model_parity.py against random-weight torch models.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..config import WhisperArch
from ..ops.linear import linear
from ..ops.qtensor import QTensor
from ..utils import capture

Params = dict[str, Any]

NEG_INF = -1e9  # finite mask value: keeps softmax well-defined in bf16

# Fused Pallas encoder attention dispatch (see attention() docstring):
# None = automatic (Pallas once the f32 score tensor crosses the size where
# XLA abandons its flash fusion), True/False = force.
USE_PALLAS_ATTENTION: bool | None = None
# Measured on v5e-16GB (whisper-small T=1500): XLA keeps the softmax chain
# fused through B=120 (scores 12.96 GB) and materializes the full f32
# (B, H, T, T) score tensor to HBM at B=128 (13.82 GB) — encoder attention
# goes 61 ms/layer vs ~16 linear. The cliff tracks HBM headroom, so the
# threshold sits just above the last measured fused point.
PALLAS_ATTN_SCORE_BYTES = 13.4e9


def layer_norm(x: jax.Array, p: Params, eps: float = 1e-5) -> jax.Array:
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mu) * lax.rsqrt(var + eps)
    return (y * p["g"].astype(jnp.float32) + p["b"].astype(jnp.float32)).astype(x.dtype)


def gelu(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=False)


def _out_width(w) -> int:
    """Output width of a weight leaf. For QTensors this comes from the DATA
    array, not the static `shape` metadata: inside shard_map the data ref is
    the local shard while `shape` stays global (N is the data's last axis
    for every 2-D kind, nf4/fp4 included since the column-K blockwise
    layout)."""
    if isinstance(w, QTensor):
        return w.data.shape[1]
    return w.shape[-1]


def _num_heads(attn_p: Params, head_dim: int) -> int:
    if "qkv" in attn_p:  # fused projection (models.fuse)
        return _out_width(attn_p["qkv"]["w"]) // 3 // head_dim
    return _out_width(attn_p["q"]["w"]) // head_dim


def qkv_project(p: Params, x: jax.Array, n_heads: int):
    """q/k/v projections -> (B, H, T, Dh) triple; uses the fused qkv matmul
    when present (models.fuse.fuse_qkv)."""
    if "qkv" in p:
        from .fuse import qkv_split

        q, k, v = qkv_split(linear(x, p["qkv"]["w"], p["qkv"].get("b")))
    else:
        q = linear(x, p["q"]["w"], p["q"].get("b"))
        k = linear(x, p["k"]["w"])
        v = linear(x, p["v"]["w"], p["v"].get("b"))
    return split_heads(q, n_heads), split_heads(k, n_heads), split_heads(v, n_heads)


def split_heads(x: jax.Array, n_heads: int) -> jax.Array:
    """(B, T, H*Dh) -> (B, H, T, Dh)"""
    b, t, _ = x.shape
    return x.reshape(b, t, n_heads, -1).transpose(0, 2, 1, 3)


def merge_heads(x: jax.Array) -> jax.Array:
    """(B, H, T, Dh) -> (B, T, H*Dh)"""
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def attention(q: jax.Array, k: jax.Array, v: jax.Array,
              mask: jax.Array | None = None) -> jax.Array:
    """Scaled dot-product attention over (B, H, T, Dh) tensors.

    Softmax accumulates in fp32 for bf16 stability; the two matmuls ride the
    MXU with fp32 accumulation. Dispatch (measured on v5e, T=1500, Dh=64):
    XLA's own flash-style fusion wins while it holds (539 ms/batch at B=96
    vs 633 Pallas), but past ~13 GB of would-be f32 scores XLA silently
    materializes the full (B, H, T, T) tensor in HBM — ~40 GB of traffic
    per layer, 1268 ms/batch at B=128 — so `encoder_attention_pallas`
    (scores kept in VMEM, q processed in blocks) takes over above
    PALLAS_ATTN_SCORE_BYTES: 819 ms/batch at B=128, restoring linear batch
    scaling. USE_PALLAS_ATTENTION=True/False forces either path.
    """
    dh = q.shape[-1]
    use_pallas = USE_PALLAS_ATTENTION
    if use_pallas is None:
        b, h, t = q.shape[0], q.shape[1], q.shape[2]
        use_pallas = b * h * t * k.shape[2] * 4 > PALLAS_ATTN_SCORE_BYTES
    if (use_pallas and mask is None
            and q.shape[2] == k.shape[2] and q.shape[2] >= 256):
        from ..ops.linear import _on_tpu

        if _on_tpu():
            from ..ops.attention import encoder_attention_pallas

            return encoder_attention_pallas(q, k, v)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


def self_attention(p: Params, x: jax.Array, head_dim: int,
                   mask: jax.Array | None = None,
                   head_mask: jax.Array | None = None) -> jax.Array:
    h = _num_heads(p, head_dim)
    q, k, v = qkv_project(p, x, h)
    o = attention(q, k, v, mask)
    if head_mask is not None:  # (H,) mask for head-importance analyses
        o = o * head_mask[None, :, None, None].astype(o.dtype)
    return linear(merge_heads(o), p["o"]["w"], p["o"].get("b"))


def cross_attention(p: Params, x: jax.Array, kv, head_dim: int,
                    head_mask: jax.Array | None = None) -> jax.Array:
    if isinstance(kv, CrossKV):  # transposed fused-kernel layout (decode)
        if head_mask is not None:
            raise ValueError("head_mask is not supported on the transposed-"
                             "KV path; use standard-layout cross-KV "
                             "(precompute_cross_kv / cross_pallas=False)")
        return _cross_attention_t(p, x, kv, head_dim)
    h = _num_heads(p, head_dim)
    q = split_heads(linear(x, p["q"]["w"], p["q"].get("b")), h)
    k, v = read_cross_kv(kv, q.dtype)  # (B, H, S, Dh) from encoder output
    o = attention(q, k, v)
    if head_mask is not None:
        o = o * head_mask[None, :, None, None].astype(o.dtype)
    return linear(merge_heads(o), p["o"]["w"], p["o"].get("b"))


def _cross_attention_t(p: Params, x: jax.Array, kv: "CrossKV",
                       head_dim: int) -> jax.Array:
    """Decode-step (q_len == 1) cross-attention over transposed K/V via the
    fused Pallas kernel (ops.cross_attention); exact-math einsum fallback
    off-TPU."""
    b = x.shape[0]
    h = _num_heads(p, head_dim)
    dh = head_dim
    q = linear(x, p["q"]["w"], p["q"].get("b"))          # (B, 1, H*Dh)
    qf = (q.reshape(b * h, dh) * (dh ** -0.5)).astype(q.dtype)
    o = cross_t_apply(qf, kv).reshape(b, 1, h * dh).astype(x.dtype)
    return linear(o, p["o"]["w"], p["o"].get("b"))


def cross_t_apply(qf: jax.Array, kv: "CrossKV") -> jax.Array:
    """(BH, Dh) pre-scaled q × transposed KV -> (BH, Dh): fused Pallas
    kernel on TPU, exact-math einsum elsewhere. Shard-map-safe (operates on
    whatever local shard it is handed — see parallel.tp_forward).

    Routed through the grouped kernel with a singleton query slot: its
    `dot_general` score/value contractions lower 30% faster on v5e than the
    elementwise broadcast-reduce variant (0.172 vs 0.249 ms/layer-call at
    whisper-small batch 64, block_g=16)."""
    from ..ops.linear import _on_tpu

    if _on_tpu():
        from ..ops.cross_attention import decode_cross_attention_grouped

        if kv.k_t.shape[0] % 16 == 0:
            return decode_cross_attention_grouped(
                qf[:, None, :], kv.k_t, kv.v_t, kv.k_scale, kv.v_scale,
                s_valid=kv.valid_len, block_g=16)[:, 0, :]
        from ..ops.cross_attention import decode_cross_attention

        return decode_cross_attention(qf, kv.k_t, kv.v_t, kv.k_scale,
                                      kv.v_scale, s_valid=kv.valid_len)
    return _cross_t_ref(qf, kv)


def _cross_t_ref(qf: jax.Array, kv: "CrossKV") -> jax.Array:
    """einsum reference for the transposed layout (same math as the kernel)."""
    if kv.k_t.shape[1] == qf.shape[1] // 2:  # split-half packed int4
        k = unpack_kv4_t(kv.k_t)
        v = unpack_kv4_t(kv.v_t)
    else:
        k = kv.k_t.astype(jnp.float32)
        v = kv.v_t.astype(jnp.float32)
    scores = jnp.einsum("gd,gds->gs", qf.astype(jnp.float32), k)
    if kv.k_scale is not None:
        scores = scores * kv.k_scale[:, 0, :]
    s_pad = k.shape[2]
    mask = (jnp.arange(s_pad) < kv.valid_len)[None, :]
    scores = jnp.where(mask, scores, -1e30)
    probs = jax.nn.softmax(scores, axis=-1)
    if kv.v_scale is not None:  # fold v dequant scale, like the kernel
        probs = probs * kv.v_scale[:, 0, :]
    return jnp.einsum("gs,gds->gd", probs, v).astype(qf.dtype)


def grouped_cross_attention(p: Params, x: jax.Array, kv, head_dim: int,
                            beam: int) -> jax.Array:
    """Cross-attention where `beam` consecutive rows of x share one K/V
    entry: x is (B*beam, 1, d), kv holds (B, H, S, Dh) — or a CrossKV for
    the fused-kernel path. Beams read the encoder K/V once per utterance
    instead of once per beam — beam-5 decode streams 5x less cross-KV."""
    if isinstance(kv, CrossKV):
        return _grouped_cross_attention_t(p, x, kv, head_dim, beam)
    h = _num_heads(p, head_dim)
    q = split_heads(linear(x, p["q"]["w"], p["q"].get("b")), h)  # (B*K,H,1,Dh)
    k, v = read_cross_kv(kv, q.dtype)                            # (B,H,S,Dh)
    bk = q.shape[0]
    b = bk // beam
    dh = q.shape[-1]
    qg = q.reshape(b, beam, h, 1, dh)
    scores = jnp.einsum("bkhqd,bhsd->bkhqs", qg * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    o = jnp.einsum("bkhqs,bhsd->bkhqd", probs, v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    o = o.reshape(bk, h, 1, dh)
    return linear(merge_heads(o), p["o"]["w"], p["o"].get("b"))


def grouped_cross_t_apply(qg: jax.Array, kv: "CrossKV") -> jax.Array:
    """(BH, K, Dh) pre-scaled grouped q × transposed KV -> (BH, K, Dh).
    K rows per (b, h) share one K/V entry (beam rows, or prefill positions —
    models.decode._cross_window_t). Fused Pallas kernel on TPU, vmapped
    einsum reference elsewhere."""
    from ..ops.linear import _on_tpu

    if _on_tpu():
        from ..ops.cross_attention import decode_cross_attention_grouped

        return decode_cross_attention_grouped(qg, kv.k_t, kv.v_t, kv.k_scale,
                                              kv.v_scale,
                                              s_valid=kv.valid_len)
    return jax.vmap(_cross_t_ref, in_axes=(1, None), out_axes=1)(qg, kv)


def _grouped_cross_attention_t(p: Params, x: jax.Array, kv: "CrossKV",
                               head_dim: int, beam: int) -> jax.Array:
    """Beam-grouped decode cross-attention via the fused Pallas kernel."""
    bk = x.shape[0]
    b = bk // beam
    h = _num_heads(p, head_dim)
    dh = head_dim
    q = linear(x, p["q"]["w"], p["q"].get("b"))          # (B*K, 1, H*Dh)
    # (B*K, H, Dh) -> (B, H, K, Dh) -> (BH, K, Dh), matching k_t's bh order
    qg = (q.reshape(b, beam, h, dh).transpose(0, 2, 1, 3)
          .reshape(b * h, beam, dh) * (dh ** -0.5)).astype(q.dtype)
    o = grouped_cross_t_apply(qg, kv)
    # (BH, K, Dh) -> (B*K, 1, H*Dh)
    o = (o.reshape(b, h, beam, dh).transpose(0, 2, 1, 3)
         .reshape(bk, 1, h * dh)).astype(x.dtype)
    return linear(o, p["o"]["w"], p["o"].get("b"))


def mlp(p: Params, x: jax.Array, fast_gelu: bool = False) -> jax.Array:
    h = jax.nn.gelu(linear(x, p["fc1"]["w"], p["fc1"].get("b")),
                    approximate=fast_gelu)
    if capture.active():  # eager-mode activation statistics (sensitivity)
        capture.record("ffn_act", h)
    return linear(h, p["fc2"]["w"], p["fc2"].get("b"))


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

def _conv1d(x: jax.Array, w: jax.Array, b: jax.Array, stride: int) -> jax.Array:
    """x: (B, C_in, T); w: torch-layout (C_out, C_in, width)."""
    y = lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    return y + b.astype(y.dtype)[None, :, None]


def encoder_layer(p: Params, x: jax.Array, head_dim: int,
                  head_mask: jax.Array | None = None,
                  fast_gelu: bool = False) -> jax.Array:
    ln_a = layer_norm(x, p["attn_ln"])
    ln_m_input = x + self_attention(p["attn"], ln_a, head_dim,
                                    head_mask=head_mask)
    ln_m = layer_norm(ln_m_input, p["mlp_ln"])
    if capture.active():  # eager calibration (quant/smooth.py)
        capture.record("attn_ln_out", ln_a)
        capture.record("mlp_ln_out", ln_m)
    return ln_m_input + mlp(p, ln_m, fast_gelu=fast_gelu)


def _encode_batch_chunks(b: int, h: int, t: int) -> int:
    """Number of encoder sub-batches (a divisor of b, smallest power of 2)
    keeping each chunk's would-be f32 score tensor under the XLA fusion
    cliff. Chunking is the PRIMARY above-cliff strategy — measured B=128
    whisper-small: 727 ms/batch chunked 2x64 (XLA fused per chunk) vs 819
    Pallas-attention vs 1268 unfused; the per-op Pallas dispatch in
    `attention()` remains as the fallback for unchunkable shapes."""
    n = 1
    while (b % (2 * n) == 0
           and (b // n) * h * t * t * 4 > PALLAS_ATTN_SCORE_BYTES):
        n *= 2
    return n


def encode(params: Params, arch: WhisperArch, mel: jax.Array,
           head_masks: jax.Array | None = None,
           merge_at: int | None = None,
           merge_factor: int = 2,
           fast_gelu: bool = False) -> jax.Array:
    """Chunked driver over `_encode_impl`: batches whose encoder attention
    would cross the XLA fusion cliff are split into sub-batches that stay
    under it (batch elements are independent — bit-identical results)."""
    h = _num_heads(params["encoder"]["layers"][0]["attn"], arch.head_dim)
    n = _encode_batch_chunks(mel.shape[0], h, mel.shape[2] // 2)
    if n > 1:
        return jnp.concatenate(
            [_encode_impl(params, arch, m, head_masks=head_masks,
                          merge_at=merge_at, merge_factor=merge_factor,
                          fast_gelu=fast_gelu)
             for m in jnp.split(mel, n)], axis=0)
    return _encode_impl(params, arch, mel, head_masks=head_masks,
                        merge_at=merge_at, merge_factor=merge_factor,
                        fast_gelu=fast_gelu)


def _encode_impl(params: Params, arch: WhisperArch, mel: jax.Array,
                 head_masks: jax.Array | None = None,
                 merge_at: int | None = None,
                 merge_factor: int = 2,
                 fast_gelu: bool = False) -> jax.Array:
    """mel: (B, n_mels, 3000) -> encoder states (B, 1500, d_model).

    head_masks: optional (L, H) per-layer attention-head mask for
    head-importance scoring (reference `attention_head_pruning.py:40-165`).

    merge_at/merge_factor: adjacent-token merging — average groups of
    `merge_factor` frames before layer `merge_at`, shrinking the remaining
    encoder layers AND every decode-time cross-attention by that factor
    (adjacent-token-merging for transducers, arXiv:2306.16009; a runtime
    compression axis the reference doesn't have).

    fast_gelu: tanh-approximate GELU in the encoder FFNs (max |Δ| ~3e-3 per
    activation). The exact-erf GELU is VPU-transcendental-bound at encoder
    scale — measured 11.3 ms vs 2.7 ms per (96k, 3072) application on v5e —
    so this trades HF bit-parity for a large encoder speedup (opt-in).
    """
    enc = params["encoder"]
    x = gelu(_conv1d(mel, enc["conv1"]["w"], enc["conv1"]["b"], stride=1))
    x = gelu(_conv1d(x, enc["conv2"]["w"], enc["conv2"]["b"], stride=2))
    x = x.transpose(0, 2, 1)  # (B, T, d)
    x = x + enc["pos"][: x.shape[1]].astype(x.dtype)
    for i, layer in enumerate(enc["layers"]):
        if merge_at is not None and i == merge_at:
            b, t, d = x.shape
            t2 = t - t % merge_factor
            x = x[:, :t2].reshape(b, t2 // merge_factor, merge_factor, d)
            x = jnp.mean(x, axis=2)
        hm = None if head_masks is None else head_masks[i]
        x = encoder_layer(layer, x, arch.head_dim, head_mask=hm,
                          fast_gelu=fast_gelu)
    return layer_norm(x, enc["ln"])


# ---------------------------------------------------------------------------
# Decoder (full-sequence path — scoring / sensitivity / teacher-forced loss)
# ---------------------------------------------------------------------------

@jax.tree_util.register_dataclass
@dataclasses.dataclass
class CrossKV:
    """Transposed per-layer cross-attention K/V for the fused decode kernel
    (ops.cross_attention): (B·H, Dh, S_pad) with Dh on sublanes and S on
    lanes — exactly tile-aligned for bf16/int8 streaming. Optional int8
    storage carries per-(bh, position) absmax scales (B·H, 1, S_pad)."""

    k_t: jax.Array
    v_t: jax.Array
    k_scale: jax.Array | None = None
    v_scale: jax.Array | None = None
    # 0 means "all S_pad positions valid" (use valid_len; a raw default of 0
    # would otherwise mask out everything)
    s_valid: int = dataclasses.field(default=0, metadata=dict(static=True))

    @property
    def valid_len(self) -> int:
        return self.s_valid if self.s_valid > 0 else self.k_t.shape[2]


def _transpose_kv(x: jax.Array, h: int) -> jax.Array:
    """(B, S, H*Dh) -> (B*H, Dh, S_pad) with S padded to the lane width."""
    b, s, d = x.shape
    x = x.reshape(b, s, h, d // h).transpose(0, 2, 3, 1)  # (B, H, Dh, S)
    s_pad = -(-s // 128) * 128
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, s_pad - s)))
    return x.reshape(b * h, d // h, s_pad)


def _quant_kv8_t(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int8-quantize transposed K/V with per-(bh, position) absmax scales."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                        1e-12) / 127.0
    q = jnp.clip(jnp.round(xf / scale), -127, 127)
    return q.astype(jnp.int8), scale


def _quant_kv4_t(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """int4-quantize transposed K/V, split-half packed along Dh: byte row d
    holds element d (low nibble) and d + Dh/2 (high nibble), per-(bh,
    position) absmax scales (see ops.cross_attention._unpack4)."""
    xf = x.astype(jnp.float32)
    scale = jnp.maximum(jnp.max(jnp.abs(xf), axis=1, keepdims=True),
                        1e-12) / 7.0
    q = jnp.clip(jnp.round(xf / scale), -7, 7).astype(jnp.int32)
    dh = x.shape[1]
    lo, hi = q[:, : dh // 2], q[:, dh // 2:]
    packed = (lo & 0xF) | ((hi & 0xF) << 4)
    return packed.astype(jnp.int8), scale


def unpack_kv4_t(packed: jax.Array) -> jax.Array:
    """Inverse of _quant_kv4_t's packing (without scales): (BH, Dh/2, S)
    int8 -> (BH, Dh, S) f32 in [-7, 7]. Delegates to the kernel's unpack so
    the CPU reference path can never drift from what the TPU kernel decodes."""
    from ..ops.cross_attention import _unpack4

    return _unpack4(packed)


def precompute_cross_kv_t(params: Params, arch: WhisperArch,
                          enc_out: jax.Array,
                          int8: bool = False,
                          bits: int | None = None) -> list[CrossKV]:
    """Transposed-layout cross-KV for the fused Pallas decode kernel —
    measured 2.2x (int8) / 1.2x (bf16) faster per decode step than the XLA
    einsum path at whisper-small batch-64 shapes (see ops.cross_attention).

    bits: 16 (dense, default), 8, or 4 (split-half packed nibbles). int8 is
    both faster AND half the capacity (dequant folds into the kernel's score
    vectors). int4 halves HBM *capacity* again (peak 2403 -> 1539 MB at the
    batch-64 headline) but stays ~7% slower than int8 on v5e (432 vs 404
    ms/batch with the split-dot kernel; was 512 before it): the kernel must
    convert the same element count to float regardless of bit width, and at
    int8 that VPU convert cost already ≈ the HBM stream cost, so halving
    bytes buys no wall time (floor analysis: DESIGN.md §8). Use int4 for
    memory headroom (e.g. very large batches), not speed."""
    from ..ops.linear import _on_tpu

    bits = bits if bits is not None else (8 if int8 else 16)
    s, d = enc_out.shape[1], enc_out.shape[2]
    use_tq = bits == 8 and _on_tpu()
    if use_tq:
        from ..ops.cross_attention import transpose_quant_supported

        use_tq = transpose_quant_supported(s, d)
    kvs = []
    for layer in params["decoder"]["layers"]:
        p = layer["cross"]
        h = _num_heads(p, arch.head_dim)
        if use_tq:  # fused Pallas transpose+quantize (2.9x the XLA chain)
            from ..ops.cross_attention import transpose_quant_kv

            k_t, ks = transpose_quant_kv(linear(enc_out, p["k"]["w"]), h)
            v_t, vs = transpose_quant_kv(
                linear(enc_out, p["v"]["w"], p["v"].get("b")), h)
            kvs.append(CrossKV(k_t, v_t, ks, vs, s_valid=s))
            continue
        k_t = _transpose_kv(linear(enc_out, p["k"]["w"]), h)
        v_t = _transpose_kv(linear(enc_out, p["v"]["w"], p["v"].get("b")), h)
        if bits == 4:
            k_t, ks = _quant_kv4_t(k_t)
            v_t, vs = _quant_kv4_t(v_t)
            kvs.append(CrossKV(k_t, v_t, ks, vs, s_valid=s))
        elif bits == 8:
            k_t, ks = _quant_kv8_t(k_t)
            v_t, vs = _quant_kv8_t(v_t)
            kvs.append(CrossKV(k_t, v_t, ks, vs, s_valid=s))
        else:
            kvs.append(CrossKV(k_t.astype(enc_out.dtype),
                               v_t.astype(enc_out.dtype), s_valid=s))
    return kvs


def precompute_cross_kv(params: Params, arch: WhisperArch,
                        enc_out: jax.Array,
                        int8: bool = False) -> list[tuple]:
    """Per-layer cross-attention K/V from encoder states (computed once per
    utterance; the decode loop then only reads them).

    int8=True stores K/V as int8 with per-(head, position) absmax scales,
    halving cross-KV HBM *capacity*. NOTE: on this (standard-layout, XLA)
    path the dequantized arrays materialize every step and int8 costs
    throughput; the decode loop instead uses `precompute_cross_kv_t` +
    the fused Pallas kernel, where the dequant is folded in and int8 is
    ~2.2x FASTER than bf16-XLA (649→490 ms/batch headline). This path
    remains for beam search (grouped KV sharing) and as reference."""
    kvs = []
    for layer in params["decoder"]["layers"]:
        p = layer["cross"]
        h = _num_heads(p, arch.head_dim)
        k = split_heads(linear(enc_out, p["k"]["w"]), h)
        v = split_heads(linear(enc_out, p["v"]["w"], p["v"].get("b")), h)
        if int8:
            kvs.append((_quant_kv8(k), _quant_kv8(v)))
        else:
            kvs.append((k, v))
    return kvs


def _quant_kv8(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                                keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def read_cross_kv(kv: tuple, dtype) -> tuple[jax.Array, jax.Array]:
    """Dequantize a precomputed cross-KV entry if it is int8."""
    k, v = kv
    if isinstance(k, tuple):  # (int8 data, scale)
        k = (k[0].astype(jnp.float32) * k[1]).astype(dtype)
        v = (v[0].astype(jnp.float32) * v[1]).astype(dtype)
        return k, v
    return k.astype(dtype), v.astype(dtype)


def decoder_layer(p: Params, x: jax.Array, cross_kv, head_dim: int,
                  self_mask: jax.Array | None,
                  head_mask: jax.Array | None = None,
                  cross_head_mask: jax.Array | None = None) -> jax.Array:
    ln_a = layer_norm(x, p["attn_ln"])
    if capture.active():  # eager calibration (quant/smooth.py)
        capture.record("attn_ln_out", ln_a)
    x = x + self_attention(p["attn"], ln_a, head_dim,
                           mask=self_mask, head_mask=head_mask)
    ln_c = layer_norm(x, p["cross_ln"])
    if capture.active():
        capture.record("cross_ln_out", ln_c)
    x = x + cross_attention(p["cross"], ln_c, cross_kv,
                            head_dim, head_mask=cross_head_mask)
    ln_m = layer_norm(x, p["mlp_ln"])
    if capture.active():
        capture.record("mlp_ln_out", ln_m)
    x = x + mlp(p, ln_m)
    return x


def decode_logits(params: Params, arch: WhisperArch, tokens: jax.Array,
                  enc_out: jax.Array,
                  self_head_masks: jax.Array | None = None,
                  cross_head_masks: jax.Array | None = None) -> jax.Array:
    """Teacher-forced decoder: tokens (B, L) -> logits (B, L, vocab)."""
    dec = params["decoder"]
    b, l = tokens.shape
    x = embed_tokens(dec, tokens.reshape(-1)).reshape(b, l, -1)
    x = x + dec["pos"][:l].astype(x.dtype)
    causal = jnp.triu(jnp.full((l, l), NEG_INF, jnp.float32), k=1)[None, None]
    cross_kvs = precompute_cross_kv(params, arch, enc_out)
    for i, layer in enumerate(dec["layers"]):
        hm = None if self_head_masks is None else self_head_masks[i]
        chm = None if cross_head_masks is None else cross_head_masks[i]
        x = decoder_layer(layer, x, cross_kvs[i], arch.head_dim, causal,
                          head_mask=hm, cross_head_mask=chm)
    x = layer_norm(x, dec["ln"])
    return project_out(dec, x)


def embed_tokens(dec: Params, flat_tokens: jax.Array) -> jax.Array:
    """Token-embedding lookup; dequantizes a QTensor embed table."""
    embed = dec["embed"]
    if isinstance(embed, QTensor):
        from ..ops.qtensor import dequantize

        embed = dequantize(embed, jnp.float32)
    return embed[flat_tokens]


def project_out(dec: Params, x: jax.Array) -> jax.Array:
    """proj_out tied to embed_tokens (HF `proj_out.weight = embed_tokens.weight`).

    Embedding lookups need a dense table, so a quantized embed is dequantized
    here (embed quantization saves disk/HBM, not matmul time)."""
    embed = dec["embed"]
    if isinstance(embed, QTensor):
        from ..ops.qtensor import dequantize

        embed = dequantize(embed, x.dtype)
    return linear(x, embed.T)


def forward(params: Params, arch: WhisperArch, mel: jax.Array,
            tokens: jax.Array,
            enc_head_masks: jax.Array | None = None,
            dec_head_masks: jax.Array | None = None,
            cross_head_masks: jax.Array | None = None) -> jax.Array:
    """Full encoder+decoder teacher-forced forward -> logits.

    Optional (L, H) head masks support head-importance scoring
    (reference `attention_head_pruning.py:99`)."""
    enc = encode(params, arch, mel, head_masks=enc_head_masks)
    return decode_logits(params, arch, tokens, enc,
                         self_head_masks=dec_head_masks,
                         cross_head_masks=cross_head_masks)


def nll_loss(params: Params, arch: WhisperArch, mel: jax.Array,
             tokens: jax.Array, labels: jax.Array,
             label_mask: jax.Array | None = None,
             enc_head_masks: jax.Array | None = None,
             dec_head_masks: jax.Array | None = None,
             cross_head_masks: jax.Array | None = None) -> jax.Array:
    """Cross-entropy used by the sensitivity scorers (reference computes the
    same via `model(..., labels=...).loss`,
    `gradient_sensitivity_test.py:229-262`)."""
    logits = forward(params, arch, mel, tokens, enc_head_masks,
                     dec_head_masks, cross_head_masks).astype(jnp.float32)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    if label_mask is not None:
        return jnp.sum(nll * label_mask) / jnp.maximum(jnp.sum(label_mask), 1.0)
    return jnp.mean(nll)
