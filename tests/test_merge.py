"""Encoder token merging (models/merge.py): pooling/ToMe math, static
shapes, and exact equivalence of the decode-config knobs to merging the
encoder output by hand."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.decode import greedy_decode
from openai_whisper_compression_tpu.models.merge import (
    merge_encoder_tokens, pool_tokens, tome_merge)
from openai_whisper_compression_tpu.models.whisper import encode


def test_pool_exact_mean():
    x = jnp.arange(2 * 6 * 4, dtype=jnp.float32).reshape(2, 6, 4)
    y = pool_tokens(x, 2)
    assert y.shape == (2, 3, 4)
    np.testing.assert_allclose(np.asarray(y[:, 0]),
                               np.asarray((x[:, 0] + x[:, 1]) / 2))


def test_pool_ragged_tail():
    x = jnp.ones((1, 7, 3), jnp.float32)
    y = pool_tokens(x, 3)
    assert y.shape == (1, 3, 3)  # 2 full windows + 1-frame tail
    np.testing.assert_allclose(np.asarray(y), 1.0)


def test_pool_stride1_identity():
    x = jnp.ones((1, 5, 2))
    assert pool_tokens(x, 1) is x
    assert merge_encoder_tokens(x) is x


def test_tome_shapes_and_bounds():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 10, 4)),
                    jnp.float32)
    y = tome_merge(x, 3)
    assert y.shape == (2, 7, 4)
    assert tome_merge(x, 0) is x
    with pytest.raises(ValueError):
        tome_merge(x, 6)  # > S // 2


def test_tome_merges_most_similar_pairs_first():
    """Frames built so A-frame 0 duplicates its B partner (cosine 1) while
    every other pair is near-orthogonal: with r=1 the duplicate pair must
    merge (their mean == the shared value) and all other frames survive."""
    rng = np.random.default_rng(1)
    s, d = 8, 16
    x = np.zeros((s, d), np.float32)
    basis = np.linalg.qr(rng.standard_normal((d, d)))[0]
    for i in range(s):
        x[i] = basis[i]            # mutually orthogonal frames
    x[0] = x[1]                    # A-frame 0 == B-frame 0 (dup pair)
    y = np.asarray(tome_merge(jnp.asarray(x)[None], 1)[0])
    assert y.shape == (s - 1, d)
    # merged output = B set then surviving A frames; the dup pair's merged
    # row equals the shared vector
    np.testing.assert_allclose(y[0], x[0], atol=1e-5)
    # every original B frame and surviving A frame appears exactly once
    remaining = {tuple(np.round(r, 4)) for r in y}
    for i in range(2, s):
        assert tuple(np.round(x[i], 4)) in remaining


def test_decode_config_pool_matches_manual_merge():
    """greedy_decode(cross_kv_pool=2) must be bit-identical to decoding a
    hand-pooled encoder output with the default config."""
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    enc = encode(params, arch, mel)
    base = DecodeConfig(max_new_tokens=8, language_token_id=None,
                        task_token_id=None)
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None, cross_kv_pool=2)
    t_knob, l_knob = greedy_decode(params, arch, enc, cfg)
    t_man, l_man = greedy_decode(params, arch, pool_tokens(enc, 2), base)
    np.testing.assert_array_equal(np.asarray(t_knob), np.asarray(t_man))
    np.testing.assert_array_equal(np.asarray(l_knob), np.asarray(l_man))


def test_decode_config_tome_matches_manual_merge():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal(
        (1, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    enc = encode(params, arch, mel)
    r = enc.shape[1] // 4
    base = DecodeConfig(max_new_tokens=8, language_token_id=None,
                        task_token_id=None)
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None, cross_kv_merge=r)
    t_knob, l_knob = greedy_decode(params, arch, enc, cfg)
    t_man, l_man = greedy_decode(params, arch, tome_merge(enc, r), base)
    np.testing.assert_array_equal(np.asarray(t_knob), np.asarray(t_man))
    np.testing.assert_array_equal(np.asarray(l_knob), np.asarray(l_man))


def test_merge_jit_static_shapes():
    """Both strategies trace under jit with static output shapes."""
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 12, 8)),
                    jnp.float32)
    pooled = jax.jit(lambda a: pool_tokens(a, 2))(x)
    merged = jax.jit(lambda a: tome_merge(a, 4))(x)
    assert pooled.shape == (1, 6, 8)
    assert merged.shape == (1, 8, 8)
