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
