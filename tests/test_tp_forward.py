"""Explicit shard_map tensor-parallel encoder: numerics vs single-device,
dense and quantized."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.whisper import encode
from openai_whisper_compression_tpu.parallel import mesh as mesh_lib
from openai_whisper_compression_tpu.parallel.tp_forward import make_tp_encoder


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    # scale q/k so softmax is peaked: near-uniform attention (tiny random
    # weights) is insensitive to head-grouping bugs and would mask them
    for comp in ("encoder", "decoder"):
        for layer in params[comp]["layers"]:
            for attn in ("attn", "cross") if comp == "decoder" else ("attn",):
                layer[attn]["q"]["w"] = layer[attn]["q"]["w"] * 8.0
                layer[attn]["k"]["w"] = layer[attn]["k"]["w"] * 8.0
    mesh = mesh_lib.make_mesh(dp=2, tp=4)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((4, arch.num_mel_bins, 64)),
                      jnp.float32)
    return arch, params, mesh, mel


def test_tp_encoder_matches_single_device(setup):
    arch, params, mesh, mel = setup
    ref = np.asarray(encode(params, arch, mel))
    fn, place = make_tp_encoder(arch, mesh, params)
    out = np.asarray(fn(place(params), mel))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_tp_encoder_quantized(setup):
    from openai_whisper_compression_tpu.quant import api as quant_api

    arch, params, mesh, mel = setup
    qp = quant_api.quantize_params(params, "int8")
    ref = np.asarray(encode(qp, arch, mel))
    fn, place = make_tp_encoder(arch, mesh, qp)
    out = np.asarray(fn(place(qp), mel))
    # per-shard dequant matmuls + psum vs fused single-device: tiny fp drift
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)


def test_tp_encoder_int4(setup):
    from openai_whisper_compression_tpu.quant import api as quant_api

    arch, params, mesh, mel = setup
    qp = quant_api.quantize_params(params, "int4")
    fn, place = make_tp_encoder(arch, mesh, qp)
    out = np.asarray(fn(place(qp), mel))
    ref = np.asarray(encode(qp, arch, mel))
    # row-parallel sub-byte weights run dense (tp_compatible); remaining
    # drift is psum reduction-order association at int4 scale magnitudes
    np.testing.assert_allclose(out, ref, atol=2e-3, rtol=2e-3)


def test_tp_greedy_decode_matches_single_device(setup):
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.models import decode
    from openai_whisper_compression_tpu.parallel.tp_forward import make_tp_decoder
    from openai_whisper_compression_tpu.quant import api as quant_api

    arch, params, mesh, mel = setup
    qp = quant_api.quantize_params(params, "int8")
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None, notimestamps=False)

    enc = encode(qp, arch, mel)
    t_ref, l_ref = decode.greedy_decode(qp, arch, enc, cfg)

    fn, place = make_tp_decoder(arch, mesh, qp, cfg)
    t_tp, l_tp = fn(place(qp), mel)

    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_tp))
    np.testing.assert_array_equal(np.asarray(l_ref), np.asarray(l_tp))


def test_tp_sp_encoder_matches_single_device(setup):
    """Megatron sequence-parallel encoder (T-sharded residual stream,
    all_gather/psum_scatter around blocks) matches the single-device
    encoder."""
    from openai_whisper_compression_tpu.parallel.tp_forward import (
        make_tp_sp_encoder)

    arch, params, mesh, mel = setup
    ref = np.asarray(encode(params, arch, mel))
    fn, place = make_tp_sp_encoder(arch, mesh, params)
    out = np.asarray(fn(place(params), mel))
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=2e-5)


def test_tp_sp_encoder_quantized(setup):
    from openai_whisper_compression_tpu.parallel.tp_forward import (
        make_tp_sp_encoder)
    from openai_whisper_compression_tpu.quant import api as quant_api

    arch, params, mesh, mel = setup
    qp = quant_api.quantize_params(params, "int8")
    ref = np.asarray(encode(qp, arch, mel))
    fn, place = make_tp_sp_encoder(arch, mesh, qp)
    out = np.asarray(fn(place(qp), mel))
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=5e-4)
