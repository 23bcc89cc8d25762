"""GPTQ quantizer (quant/gptq.py): beats round-to-nearest on correlated
activations, Hessian tap collection, full-model application."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.whisper import forward
from openai_whisper_compression_tpu.ops.qtensor import QTensor, dequantize
from openai_whisper_compression_tpu.quant import gptq
from openai_whisper_compression_tpu.quant.core import quantize_int_sub8


def _layer_err(x, w, q):
    """||X W - X deq(q)||_F."""
    deq = np.asarray(dequantize(q, jnp.float32))
    return float(np.linalg.norm(x @ np.asarray(w) - x @ deq))


def test_gptq_beats_rtn_int4():
    rng = np.random.default_rng(0)
    k, n, m = 64, 96, 512
    w = rng.standard_normal((k, n)).astype(np.float32) * 0.1
    # correlated, anisotropic activations (where Hessian-awareness pays)
    mix = rng.standard_normal((k, k)).astype(np.float32)
    mix = mix @ np.diag(np.linspace(0.05, 3.0, k)).astype(np.float32)
    x = rng.standard_normal((m, k)).astype(np.float32) @ mix
    h = x.T @ x

    q_gptq = gptq.quantize_gptq(jnp.asarray(w), h, bits=4)
    q_rtn = quantize_int_sub8(jnp.asarray(w), 4)
    assert q_gptq.kind == q_rtn.kind == "int4_pack"
    e_gptq = _layer_err(x, w, q_gptq)
    e_rtn = _layer_err(x, w, q_rtn)
    assert e_gptq < e_rtn * 0.9, (e_gptq, e_rtn)


def test_gptq_int8_kind():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 16)).astype(np.float32)
    x = rng.standard_normal((64, 32)).astype(np.float32)
    q = gptq.quantize_gptq(jnp.asarray(w), x.T @ x, bits=8)
    assert q.kind == "int8_pc"
    # int8 on benign data: near-lossless either way
    assert _layer_err(x, w, q) < 0.05 * np.linalg.norm(x @ w)


def test_tap_collects_hessians():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    mel = jnp.asarray(rng.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 900, (2, 4)), jnp.int32)

    hs = gptq.collect_hessians(
        params, lambda p: forward(p, arch, mel, toks))
    assert "encoder.layers.0.attn.q.w" in hs
    assert "decoder.layers.1.fc2.w" in hs
    h = hs["encoder.layers.0.fc1.w"]
    assert h.shape == (arch.d_model, arch.d_model)
    np.testing.assert_allclose(h, h.T, rtol=1e-4)
    assert np.all(np.linalg.eigvalsh(h) > -1e-3)  # PSD


def test_gptq_quantize_params_end_to_end():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    mel = jnp.asarray(rng.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    toks = jnp.asarray(rng.integers(0, 900, (2, 4)), jnp.int32)

    qparams = gptq.gptq_quantize_params(
        params, lambda p: forward(p, arch, mel, toks), bits=4)
    from openai_whisper_compression_tpu.models.params import named_leaves
    kinds = [leaf.kind for _, leaf in named_leaves(qparams)
             if isinstance(leaf, QTensor)]
    assert kinds and set(kinds) == {"int4_pack"}
    # quantized model still runs
    lg = forward(qparams, arch, mel, toks)
    assert np.isfinite(np.asarray(lg)).all()


def test_gptq_nan_hessian_falls_back_to_rtn():
    """A non-finite / ill-conditioned Hessian must never emit NaN-derived
    weights: the solve re-damps and finally falls back to plain RTN."""
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.ops.qtensor import dequantize
    from openai_whisper_compression_tpu.quant.gptq import quantize_gptq

    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 8)).astype(np.float32)
    bad_h = np.full((16, 16), np.nan, np.float32)
    q = quantize_gptq(jnp.asarray(w), bad_h, bits=8)
    deq = np.asarray(dequantize(q, jnp.float32))
    assert np.isfinite(deq).all()
    # RTN fallback quantizes to the per-channel grid
    assert np.abs(deq - w).max() <= np.abs(w).max() / 127 + 1e-5
