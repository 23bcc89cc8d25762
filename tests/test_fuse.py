"""qkv-fusion tests: numerical equality with the unfused model (dense and
quantized), decode-loop compatibility, graceful skip of unfusable kinds."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.models import decode, fuse
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.whisper import encode, forward
from openai_whisper_compression_tpu.ops.qtensor import QTensor
from openai_whisper_compression_tpu.quant import api as quant_api


@pytest.fixture(scope="module")
def model():
    arch = ARCHS["test2l"]
    return P.init_params(arch, jax.random.PRNGKey(0)), arch


@pytest.fixture(scope="module")
def mel(model):
    _, arch = model
    g = np.random.default_rng(3)
    return jnp.asarray(g.standard_normal((2, arch.num_mel_bins, 64)),
                       jnp.float32)


def test_fused_dense_matches(model, mel):
    params, arch = model
    fused = fuse.fuse_qkv(params, components=("encoder", "decoder"))
    assert "qkv" in fused["decoder"]["layers"][0]["attn"]
    assert "q" not in fused["decoder"]["layers"][0]["attn"]
    tokens = jnp.asarray([[998, 1, 2], [998, 3, 4]])
    np.testing.assert_allclose(
        np.asarray(forward(params, arch, mel, tokens)),
        np.asarray(forward(fused, arch, mel, tokens)), atol=1e-5)


def test_fused_int8_matches(model, mel):
    params, arch = model
    qp = quant_api.quantize_params(params, "int8")
    fused = fuse.fuse_qkv(qp)
    q = fused["decoder"]["layers"][0]["attn"]["qkv"]["w"]
    assert isinstance(q, QTensor) and q.shape == (arch.d_model, 3 * arch.d_model)
    tokens = jnp.asarray([[998, 1, 2], [998, 3, 4]])
    np.testing.assert_allclose(
        np.asarray(forward(qp, arch, mel, tokens)),
        np.asarray(forward(fused, arch, mel, tokens)), atol=1e-5)


def test_fused_decode_matches(model, mel):
    params, arch = model
    fused = fuse.fuse_qkv(params)
    enc = encode(params, arch, mel)
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None, notimestamps=False)
    t0, l0 = decode.greedy_decode(params, arch, enc, cfg)
    t1, l1 = decode.greedy_decode(fused, arch, enc, cfg)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(l0), np.asarray(l1))


def test_nf4_fuses(model):
    """NF4's column-K blockwise layout concats along N like every other
    kind; the fused qkv matmul must match the unfused projections."""
    from openai_whisper_compression_tpu.ops.qtensor import dequantize

    params, _ = model
    qp = quant_api.quantize_params(params, "nf4")
    attn0 = qp["decoder"]["layers"][0]["attn"]
    fused = fuse.fuse_qkv(qp)
    fattn = fused["decoder"]["layers"][0]["attn"]
    assert "qkv" in fattn
    wq, wk, wv = (dequantize(attn0[c]["w"]) for c in ("q", "k", "v"))
    wf = dequantize(fattn["qkv"]["w"])
    np.testing.assert_allclose(
        np.asarray(wf), np.concatenate([wq, wk, wv], axis=1), rtol=1e-6)


def test_fused_sharding(model):
    from openai_whisper_compression_tpu.parallel import mesh as mesh_lib

    params, arch = model
    fused = fuse.fuse_qkv(params)
    mesh = mesh_lib.make_mesh(dp=2, tp=4)
    sharded = mesh_lib.shard_params(fused, mesh)
    w = P.get_leaf(sharded, "decoder.layers.0.attn.qkv.w")
    assert w.sharding.spec == jax.sharding.PartitionSpec(None, None)
