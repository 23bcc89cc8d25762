"""Fused decode-step self-attention kernel vs. naive reference.

Covers ops.self_attention_step (interpret mode on CPU): masked softmax
attention over the cache window, pos boundaries, left-padded prompt starts,
and the decoder_step integration flag (DecodeConfig.self_pallas).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from openai_whisper_compression_tpu.ops.self_attention_step import (
    decode_self_attention)


def _ref(q, kc, vc, pos, start=None):
    s = kc.shape[1]
    scores = np.einsum("gd,gsd->gs", np.asarray(q, np.float32),
                       np.asarray(kc, np.float32))
    idx = np.arange(s)[None]
    ok = idx <= pos
    if start is not None:
        ok = ok & (idx >= np.asarray(start)[:, None])
    scores = np.where(ok, scores, -1e30)
    m = scores.max(-1, keepdims=True)
    p = np.exp(scores - m)
    p /= p.sum(-1, keepdims=True)
    return np.einsum("gs,gsd->gd", p, np.asarray(vc, np.float32))


@pytest.mark.parametrize("pos", [0, 5, 15])
def test_matches_reference(pos):
    bh, s, dh = 24, 16, 64
    rng = np.random.default_rng(0)
    kc = jnp.asarray(rng.standard_normal((bh, s, dh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((bh, s, dh)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((bh, dh)), jnp.float32) * dh ** -0.5
    out = decode_self_attention(q, kc, vc, jnp.int32(pos), block_g=8)
    np.testing.assert_allclose(np.asarray(out), _ref(q, kc, vc, pos),
                               atol=1e-5)


def test_start_masking():
    bh, s, dh = 16, 16, 64
    rng = np.random.default_rng(1)
    kc = jnp.asarray(rng.standard_normal((bh, s, dh)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((bh, s, dh)), jnp.float32)
    q = jnp.asarray(rng.standard_normal((bh, dh)), jnp.float32) * dh ** -0.5
    start = jnp.asarray(rng.integers(0, 5, (bh,)), jnp.int32)
    out = decode_self_attention(q, kc, vc, jnp.int32(7), start=start,
                                block_g=8)
    np.testing.assert_allclose(np.asarray(out), _ref(q, kc, vc, 7, start),
                               atol=1e-5)


def test_int8_cache_scales():
    """int8 cache with per-position scales matches dequantize-then-attend."""
    bh, s, dh = 16, 16, 64
    rng = np.random.default_rng(3)
    kq = rng.integers(-127, 128, (bh, s, dh)).astype(np.int8)
    vq = rng.integers(-127, 128, (bh, s, dh)).astype(np.int8)
    ks = (rng.random((bh, s)) * 0.02 + 1e-3).astype(np.float32)
    vs = (rng.random((bh, s)) * 0.02 + 1e-3).astype(np.float32)
    q = jnp.asarray(rng.standard_normal((bh, dh)), jnp.float32) * dh ** -0.5
    out = decode_self_attention(jnp.asarray(q), jnp.asarray(kq),
                                jnp.asarray(vq), jnp.int32(9),
                                k_scale=jnp.asarray(ks),
                                v_scale=jnp.asarray(vs), block_g=8)
    ref = _ref(q, kq.astype(np.float32) * ks[..., None],
               vq.astype(np.float32) * vs[..., None], 9)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_greedy_int8_kv_cache_parity():
    """greedy decode with kv_int8: fused kernel path (interpret) vs XLA path
    is token-identical."""
    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.models import decode as D

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(4))
    rng = np.random.default_rng(5)
    enc = jnp.asarray(rng.standard_normal(
        (2, arch.max_source_positions, arch.d_model)) * 0.1, jnp.float32)
    outs = []
    for sp in (True, False):
        cfg = DecodeConfig(max_new_tokens=6, kv_int8=True, self_pallas=sp)
        outs.append(jax.jit(lambda p, e, c=cfg: D.greedy_decode(
            p, arch, e, c))(params, enc))
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))


def test_greedy_decode_parity_self_pallas_flag():
    """decoder path with self_pallas on vs off is token-identical (CPU both
    run the XLA/interpret math)."""
    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.models import decode as D

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal(
        (2, arch.max_source_positions, arch.d_model)) * 0.1, jnp.float32)
    cfgs = [DecodeConfig(max_new_tokens=6, self_pallas=sp) for sp in
            (True, False)]
    outs = [jax.jit(lambda p, e, c=c: D.greedy_decode(p, arch, e, c))(
        params, enc) for c in cfgs]
    np.testing.assert_array_equal(np.asarray(outs[0][0]),
                                  np.asarray(outs[1][0]))
    np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                  np.asarray(outs[1][1]))
