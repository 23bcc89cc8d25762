"""Fused decode cross-attention kernel (ops/cross_attention.py) tests:
numerics vs einsum (interpret mode on CPU) and end-to-end decode parity
between the transposed-KV path and the standard XLA path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from openai_whisper_compression_tpu.ops.cross_attention import (
    decode_cross_attention, pad_cross_len)


def _ref(q, k_t, v_t):
    s = jnp.einsum("gd,gds->gs", q.astype(jnp.float32), k_t.astype(jnp.float32))
    p = jax.nn.softmax(s, -1)
    return jnp.einsum("gs,gds->gd", p, v_t.astype(jnp.float32))


@pytest.mark.parametrize("s", [128, 300])
def test_kernel_bf16_matches_einsum(s):
    g = np.random.default_rng(0)
    bh, dh = 8, 64
    sp = pad_cross_len(s)
    q = jnp.asarray(g.standard_normal((bh, dh)), jnp.float32)
    k = jnp.asarray(g.standard_normal((bh, dh, s)), jnp.float32)
    v = jnp.asarray(g.standard_normal((bh, dh, s)), jnp.float32)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sp - s)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sp - s)))
    out = decode_cross_attention(q, kp.astype(jnp.bfloat16),
                                 vp.astype(jnp.bfloat16), s_valid=s)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(_ref(q, k, v)), atol=0.05)


def test_kernel_int8_matches_dequant_ref():
    g = np.random.default_rng(1)
    bh, dh, s = 16, 64, 256
    sp = pad_cross_len(s)
    q = jnp.asarray(g.standard_normal((bh, dh)), jnp.float32)
    k = jnp.asarray(g.standard_normal((bh, dh, sp)), jnp.float32)
    v = jnp.asarray(g.standard_normal((bh, dh, sp)), jnp.float32)

    def q8(x):
        sc = jnp.maximum(jnp.abs(x).max(axis=1, keepdims=True), 1e-12) / 127.0
        return jnp.clip(jnp.round(x / sc), -127, 127).astype(jnp.int8), sc

    k8, ks = q8(k)
    v8, vs = q8(v)
    out = decode_cross_attention(q, k8, v8, ks, vs, s_valid=s)
    ref = _ref(q, (k8.astype(jnp.float32) * ks)[:, :, :s],
               (v8.astype(jnp.float32) * vs)[:, :, :s])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.02)
    # and the int8 quantization error itself stays small
    exact = _ref(q, k[:, :, :s], v[:, :, :s])
    assert float(jnp.abs(out - exact).max()) < 0.15


def test_padding_is_masked():
    """Garbage in the padded S region must not leak into the output."""
    g = np.random.default_rng(2)
    bh, dh, s = 8, 64, 100
    sp = pad_cross_len(s)
    q = jnp.asarray(g.standard_normal((bh, dh)), jnp.float32)
    k = jnp.asarray(g.standard_normal((bh, dh, sp)), jnp.float32)
    v = jnp.asarray(g.standard_normal((bh, dh, sp)), jnp.float32)
    poisoned_k = k.at[:, :, s:].set(100.0)
    poisoned_v = v.at[:, :, s:].set(-77.0)
    a = decode_cross_attention(q, k.astype(jnp.bfloat16),
                               v.astype(jnp.bfloat16), s_valid=s)
    b = decode_cross_attention(q, poisoned_k.astype(jnp.bfloat16),
                               poisoned_v.astype(jnp.bfloat16), s_valid=s)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_greedy_decode_transposed_path_token_parity(rng):
    """cross_pallas=True (transposed KV + fallback einsum on CPU) decodes the
    same tokens as the standard XLA path."""
    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.models import decode, params as P
    from openai_whisper_compression_tpu.models.whisper import encode

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(3))
    mel = jnp.asarray(rng.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    enc = encode(params, arch, mel)

    def run(cross_pallas):
        cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                           task_token_id=None, notimestamps=False,
                           cross_pallas=cross_pallas)
        t, l = decode.greedy_decode(params, arch, enc, cfg)
        return np.asarray(t), np.asarray(l)

    t1, l1 = run(True)
    t0, l0 = run(False)
    np.testing.assert_array_equal(l1, l0)
    np.testing.assert_array_equal(t1, t0)


def test_beam_decode_transposed_path_token_parity(rng):
    """Beam search through the grouped transposed-KV path decodes the same
    tokens as the standard grouped XLA path."""
    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.models import decode, params as P
    from openai_whisper_compression_tpu.models.whisper import encode

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(5))
    mel = jnp.asarray(rng.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    enc = encode(params, arch, mel)

    def run(cross_pallas):
        cfg = DecodeConfig(max_new_tokens=6, beam_size=3,
                           language_token_id=None, task_token_id=None,
                           notimestamps=False, cross_pallas=cross_pallas)
        t, l = decode.beam_decode(params, arch, enc, cfg)
        return np.asarray(t), np.asarray(l)

    t1, l1 = run(True)
    t0, l0 = run(False)
    np.testing.assert_array_equal(l1, l0)
    np.testing.assert_array_equal(t1, t0)


def test_transposed_path_with_pruned_heads(rng):
    """Physically head-pruned params (per-layer head counts differ) decode
    identically through the transposed-KV path and the standard path."""
    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.models import decode, params as P
    from openai_whisper_compression_tpu.models.whisper import encode
    from openai_whisper_compression_tpu.prune.structured import prune_heads_by_l1

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(9))
    params = prune_heads_by_l1(params, arch, 0.5, physical=True)
    mel = jnp.asarray(rng.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    enc = encode(params, arch, mel)

    def run(cross_pallas):
        cfg = DecodeConfig(max_new_tokens=6, language_token_id=None,
                           task_token_id=None, notimestamps=False,
                           cross_pallas=cross_pallas)
        t, l = decode.greedy_decode(params, arch, enc, cfg)
        return np.asarray(t), np.asarray(l)

    t1, l1 = run(True)
    t0, l0 = run(False)
    np.testing.assert_array_equal(l1, l0)
    np.testing.assert_array_equal(t1, t0)


def test_kernel_int4_matches_dequant_ref():
    """Split-half packed int4 K/V: kernel output matches the dequantized
    einsum reference; error vs exact stays bounded."""
    from openai_whisper_compression_tpu.models.whisper import (
        _quant_kv4_t, unpack_kv4_t)

    g = np.random.default_rng(4)
    bh, dh, s = 16, 64, 256
    sp = pad_cross_len(s)
    # 0.3 scale ≈ realistic post-LN score magnitudes; raw N(0,1) makes the
    # softmax adversarially peaked (scores ±8) and int4 error explodes
    q = jnp.asarray(g.standard_normal((bh, dh)) * 0.3, jnp.float32)
    k = jnp.asarray(g.standard_normal((bh, dh, sp)) * 0.3, jnp.float32)
    v = jnp.asarray(g.standard_normal((bh, dh, sp)) * 0.3, jnp.float32)

    k4, ks = _quant_kv4_t(k)
    v4, vs = _quant_kv4_t(v)
    assert k4.shape == (bh, dh // 2, sp)
    # pack/unpack round-trip
    np.testing.assert_array_equal(
        np.asarray(unpack_kv4_t(k4) * ks), np.asarray(
            jnp.clip(jnp.round(k / ks), -7, 7) * ks))

    out = decode_cross_attention(q, k4, v4, ks, vs, s_valid=s)
    ref = _ref(q, (unpack_kv4_t(k4) * ks)[:, :, :s],
               (unpack_kv4_t(v4) * vs)[:, :, :s])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), atol=0.02)
    exact = _ref(q, k[:, :, :s], v[:, :, :s])
    err = jnp.abs(out - exact)
    # int4 is coarse on adversarial random-normal data: bound the mean
    # tightly and the tail loosely
    assert float(err.mean()) < 0.08
    assert float(err.max()) < 1.5


def test_greedy_decode_int4_cross_kv(rng):
    """End-to-end greedy decode with int4 cross-KV runs and mostly agrees
    with the dense decode on the tiny model."""
    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.models import decode, params as P
    from openai_whisper_compression_tpu.models.whisper import encode

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(7))
    mel = jnp.asarray(rng.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    enc = encode(params, arch, mel)

    def run(**kw):
        cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                           task_token_id=None, notimestamps=False, **kw)
        t, l = decode.greedy_decode(params, arch, enc, cfg)
        return np.asarray(t)

    t4 = run(cross_kv_int4=True)
    t_dense = run()
    agree = (t4 == t_dense).mean()
    assert agree > 0.5, f"int4 cross-KV diverged too much: {agree}"


def test_transpose_quant_kernel_matches_xla_chain():
    """Fused transpose+quant produces byte-identical int8 data and scales to
    the plain transpose->pad->quant chain."""
    from openai_whisper_compression_tpu.models.whisper import (
        _quant_kv8_t, _transpose_kv)
    from openai_whisper_compression_tpu.ops.cross_attention import (
        transpose_quant_kv, transpose_quant_supported)

    g = np.random.default_rng(8)
    b, s, h, dh = 3, 200, 4, 16
    x = jnp.asarray(g.standard_normal((b, s, h * dh)) * 0.4, jnp.float32)
    assert transpose_quant_supported(s, h * dh)
    q, sc = transpose_quant_kv(x, h)
    q_ref, sc_ref = _quant_kv8_t(_transpose_kv(x, h))
    assert q.shape == q_ref.shape == (b * h, dh, pad_cross_len(s))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q_ref))
    np.testing.assert_allclose(np.asarray(sc), np.asarray(sc_ref), rtol=1e-6)
