"""GPipe pipeline-parallel encoder (parallel/pipeline.py): output parity vs
the single-device encoder on a virtual 'pp' mesh, and reverse-mode
differentiability through the ppermute schedule."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P_, whisper
from openai_whisper_compression_tpu.parallel import pipeline


def _mesh(pp):
    devs = np.array(jax.devices()[:pp])
    return Mesh(devs, ("pp",))


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]  # 2 encoder layers
    params = P_.init_params(arch, jax.random.PRNGKey(4))
    g = np.random.default_rng(5)
    mel = jnp.asarray(g.standard_normal(
        (4, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    return arch, params, mel


@pytest.mark.parametrize("pp,n_micro", [(2, 2), (2, 4)])
def test_pp_encoder_matches_single_device(setup, pp, n_micro):
    arch, params, mel = setup
    ref = np.asarray(whisper.encode(params, arch, mel))
    out = np.asarray(pipeline.pp_encode(params, arch, _mesh(pp), mel,
                                        n_micro=n_micro))
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_pp_encoder_grad(setup):
    """The pipeline (scan + ppermute) is reverse-differentiable — required
    for gradient/Fisher sensitivity scoring through a pipelined model."""
    arch, params, mel = setup
    mesh = _mesh(2)
    enc = params["encoder"]
    fn, place = pipeline.make_pp_encoder(arch, mesh, n_micro=2)
    stacked = place(pipeline.stack_layers(enc["layers"]))
    stem = {"conv1": enc["conv1"], "conv2": enc["conv2"], "pos": enc["pos"]}

    def loss(stacked):
        return jnp.sum(fn(stem, stacked, enc["ln"], mel) ** 2)

    g = jax.grad(loss)(stacked)
    leaves = jax.tree.leaves(g)
    assert leaves and all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # every stage's layers received gradient signal
    w = np.asarray(g["fc1"]["w"])  # (L, d, ffn) stacked
    assert all(np.abs(w[i]).max() > 0 for i in range(w.shape[0]))


def test_pp_divisibility_guards(setup):
    arch, params, mel = setup
    with pytest.raises(AssertionError):
        pipeline.pp_encode(params, arch, _mesh(2), mel, n_micro=3)  # 4 % 3
    arch8 = ARCHS["test2l"]
    p3 = P_.init_params(arch8.replace(encoder_layers=3),
                        jax.random.PRNGKey(0))
    with pytest.raises(AssertionError):  # 3 layers % pp=2
        pipeline.pp_encode(p3, arch8.replace(encoder_layers=3), _mesh(2), mel)
