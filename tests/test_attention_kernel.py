"""Fused encoder-attention kernel vs XLA reference (interpret mode on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.models.whisper import attention
from openai_whisper_compression_tpu.ops.attention import encoder_attention_pallas


def _xla_attention(q, k, v):
    dh = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * (dh ** -0.5), k,
                        preferred_element_type=jnp.float32)
    p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", p, v,
                      preferred_element_type=jnp.float32).astype(q.dtype)


@pytest.mark.parametrize("t", [256, 300, 1500])
def test_kernel_matches_xla(t, rng):
    b, h, dh = 2, 4, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.float32)
    ref = _xla_attention(q, k, v)
    out = encoder_attention_pallas(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_kernel_bf16(rng):
    b, h, t, dh = 1, 2, 384, 64
    q = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, t, dh)), jnp.bfloat16)
    ref = _xla_attention(q, k, v).astype(jnp.float32)
    out = encoder_attention_pallas(q, k, v).astype(jnp.float32)
    assert float(jnp.max(jnp.abs(out - ref))) < 0.05


def test_model_attention_unchanged_off_tpu(rng):
    """On CPU the model attention stays on the XLA path (kernel dispatch is
    TPU-gated), so existing parity tests keep covering it."""
    q = jnp.asarray(rng.standard_normal((1, 2, 300, 64)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((1, 2, 300, 64)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((1, 2, 300, 64)), jnp.float32)
    np.testing.assert_allclose(np.asarray(attention(q, k, v)),
                               np.asarray(_xla_attention(q, k, v)),
                               atol=1e-5)


def test_auto_dispatch_threshold(rng, monkeypatch):
    """attention() routes to the Pallas kernel only past the measured XLA
    fusion cliff (PALLAS_ATTN_SCORE_BYTES), and respects force-overrides."""
    from openai_whisper_compression_tpu.models import whisper as W
    from openai_whisper_compression_tpu.ops import attention as A

    calls = []
    real = A.encoder_attention_pallas

    def spy(*a, **kw):
        calls.append(1)
        return real(*a, **kw)

    monkeypatch.setattr(A, "encoder_attention_pallas", spy)
    monkeypatch.setattr("openai_whisper_compression_tpu.ops.linear._on_tpu",
                        lambda: True)
    q = jnp.asarray(rng.standard_normal((1, 2, 256, 64)), jnp.float32)
    # 1*2*256*256*4 bytes << threshold -> XLA path
    assert W.USE_PALLAS_ATTENTION is None  # auto is the shipped default
    W.attention(q, q, q)
    assert calls == []
    # drop the threshold below this shape's score bytes -> Pallas path
    monkeypatch.setattr(W, "PALLAS_ATTN_SCORE_BYTES", 1.0)
    W.attention(q, q, q)
    assert calls == [1]
    # force-off wins over the threshold
    monkeypatch.setattr(W, "USE_PALLAS_ATTENTION", False)
    W.attention(q, q, q)
    assert calls == [1]


def test_vmem_guard_shrinks_f32_blocks():
    """The fused decode kernels' block-shrink heuristics: bf16 caches keep
    the benched block sizes; f32 caches (2x the bytes, same lane padding)
    shrink one step further — pinned against the measured 18.04/24.00 MB
    scoped-VMEM OOMs at whisper-small B=128 shapes (DESIGN.md §8)."""
    from openai_whisper_compression_tpu.ops.cross_attention import (
        _fit_block_g as fit_cross)
    from openai_whisper_compression_tpu.ops.self_attention_step import (
        _fit_block_g as fit_self)

    # whisper-small decode shapes: bh up to 1536 (B=128 x 12 heads)
    assert fit_self(256, 1536, 64, 64, jnp.bfloat16) == 128  # benched block
    assert fit_self(256, 1536, 64, 64, jnp.float32) == 64    # one step down
    assert fit_cross(16, 1536, 64, 1536, jnp.bfloat16) == 16  # benched
    assert fit_cross(16, 1536, 64, 1536, jnp.float32) == 8    # fits 16MB
    assert fit_cross(16, 1536, 64, 1536, jnp.int8) == 16      # unchanged
    assert fit_cross(16, 1536, 32, 1536, jnp.int8) == 16      # int4 packed

    # bh % 8 != 0 (small batches: B=2 x 6 heads = 12): power-of-2 halving
    # bottoms out at a Mosaic-invalid 4 — both helpers must fall back to
    # the full-array block (valid: block dim == array dim)
    assert fit_self(256, 12, 64, 64, jnp.bfloat16) == 12
    assert fit_self(256, 20, 64, 64, jnp.float32) == 20
    assert fit_cross(8, 12, 64, 1536, jnp.bfloat16) == 12
    assert fit_cross(8, 6, 64, 1536, jnp.int8) == 6
    # multiples of 8 keep the tuned power-of-2 blocks
    assert fit_self(256, 48, 64, 64, jnp.bfloat16) == 16
    assert fit_cross(8, 48, 64, 1536, jnp.bfloat16) == 8


def test_encode_batch_chunking_bit_identical(rng, monkeypatch):
    """encode() splits over-cliff batches into sub-batches; batch elements
    are independent so the result is bit-identical to the unchunked path."""
    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.models import whisper as W

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    mel = jnp.asarray(rng.standard_normal(
        (4, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    ref = W.encode(params, arch, mel)
    # real whisper-small shapes at the shipped threshold
    assert W._encode_batch_chunks(128, 12, 1500) == 2
    assert W._encode_batch_chunks(96, 12, 1500) == 1
    # force the cliff below this shape's score bytes -> 4 chunks
    monkeypatch.setattr(W, "PALLAS_ATTN_SCORE_BYTES", 1.0)
    h = arch.encoder_heads
    t = arch.max_source_positions
    assert W._encode_batch_chunks(4, h, t) == 4
    out = W.encode(params, arch, mel)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # divisor rule: odd batches can't split
    assert W._encode_batch_chunks(3, h, t) == 1
