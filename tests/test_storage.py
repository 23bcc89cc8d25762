"""Storage format tests: round-trips (dense, pruned-sparse, quantized),
compression wins on sparse models, checkpoint save/load."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.storage import checkpoint, formats


@pytest.fixture(scope="module")
def model():
    arch = ARCHS["test2l"]
    return P.init_params(arch, jax.random.PRNGKey(0)), arch


@pytest.mark.parametrize("fmt", ["sparse_zip", "gzip", "npz"])
def test_roundtrip_dense(model, tmp_path, fmt):
    params, _ = model
    res = formats.verify_roundtrip(params, str(tmp_path / f"m.{fmt}"), fmt)
    assert res["ok"], res["mismatches"][:5]


def test_roundtrip_pruned_and_compression_win(model, tmp_path):
    from openai_whisper_compression_tpu.prune import magnitude

    params, _ = model
    pruned = magnitude.prune_global_l1(params, 0.9)

    dense_res = formats.verify_roundtrip(params, str(tmp_path / "d.zip"),
                                         "sparse_zip")
    sparse_res = formats.verify_roundtrip(pruned, str(tmp_path / "s.zip"),
                                          "sparse_zip")
    assert sparse_res["ok"]
    assert sparse_res["sparse_tensors"] > 0
    # 90%-pruned model compresses much smaller on disk
    assert sparse_res["file_mb"] < 0.65 * dense_res["file_mb"]

    # loaded model preserves exact sparsity (reference's verification step)
    loaded = formats.load_sparse_zip(str(tmp_path / "s.zip"))
    orig_rep = magnitude.sparsity_report(pruned, magnitude.linear_weights)
    new_rep = magnitude.sparsity_report(loaded, magnitude.linear_weights)
    assert orig_rep["overall_sparsity"] == new_rep["overall_sparsity"]


def test_roundtrip_quantized(model, tmp_path):
    from openai_whisper_compression_tpu.models.whisper import forward
    from openai_whisper_compression_tpu.quant import api as quant_api

    params, arch = model
    for method in ("int8", "int4", "nf4_dq", "hqq_int4", "fp8"):
        qp = quant_api.quantize_params(params, method)
        res = formats.verify_roundtrip(
            qp, str(tmp_path / f"q_{method}.zip"), "sparse_zip")
        assert res["ok"], (method, res["mismatches"][:5])

    # loaded quantized model produces identical outputs
    qp = quant_api.quantize_params(params, "int8")
    formats.save_sparse_zip(qp, str(tmp_path / "q.zip"))
    loaded = formats.load_sparse_zip(str(tmp_path / "q.zip"))
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((1, arch.num_mel_bins, 64)), jnp.float32)
    toks = jnp.asarray([[998, 1, 2]])
    np.testing.assert_allclose(np.asarray(forward(qp, arch, mel, toks)),
                               np.asarray(forward(loaded, arch, mel, toks)),
                               atol=1e-6)


def test_roundtrip_structurally_pruned(model, tmp_path):
    """Physically shrunk models (heads dropped, layers removed) round-trip."""
    from openai_whisper_compression_tpu.prune import structured

    params, arch = model
    pruned = structured.drop_layers(
        structured.prune_heads_by_l1(params, arch, 0.5), "decoder", [1])
    res = formats.verify_roundtrip(pruned, str(tmp_path / "sp.zip"),
                                   "sparse_zip")
    assert res["ok"]
    loaded = formats.load_sparse_zip(str(tmp_path / "sp.zip"))
    assert len(loaded["decoder"]["layers"]) == arch.decoder_layers - 1
    qw = P.get_leaf(loaded, "encoder.layers.0.attn.q.w")
    assert qw.shape[1] == 2 * arch.head_dim


def test_checkpoint_save_load(model, tmp_path):
    params, _ = model
    p = checkpoint.save(params, str(tmp_path / "ckpt.npz"))
    loaded = checkpoint.load(p)
    w0 = P.get_leaf(params, "encoder.conv1.w")
    w1 = P.get_leaf(loaded, "encoder.conv1.w")
    np.testing.assert_array_equal(np.asarray(w0), np.asarray(w1))
