"""Sharding tests on the 8-device virtual CPU mesh (conftest sets it up)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.whisper import nll_loss
from openai_whisper_compression_tpu.parallel import mesh as mesh_lib
from openai_whisper_compression_tpu.parallel.steps import make_train_step


@pytest.fixture(scope="module")
def arch():
    return ARCHS["test2l"]


def test_mesh_and_tp_choice():
    assert len(jax.devices()) == 8
    assert mesh_lib.choose_tp(8, 4, 128) == 4
    assert mesh_lib.choose_tp(8, 6, 128) == 2
    assert mesh_lib.choose_tp(1, 12, 128) == 1
    m = mesh_lib.make_mesh(dp=2, tp=4)
    assert m.shape == {"dp": 2, "tp": 4}


def test_sharded_train_step_matches_single_device(arch):
    rng = np.random.default_rng(0)
    params = P.init_params(arch, jax.random.PRNGKey(0))
    mel = jnp.asarray(rng.standard_normal((4, arch.num_mel_bins, 128)),
                      jnp.float32)
    tokens = jnp.asarray(rng.integers(0, arch.vocab_size, (4, 6)), jnp.int32)
    labels = jnp.asarray(rng.integers(0, arch.vocab_size, (4, 6)), jnp.int32)

    # single-device reference loss
    ref_loss = float(nll_loss(params, arch, mel, tokens, labels))

    mesh = mesh_lib.make_mesh(dp=2, tp=4)
    step, place_params, place_batch = make_train_step(arch, mesh, lr=1e-3)
    sp = place_params(P.init_params(arch, jax.random.PRNGKey(0)))
    smel, stok, slab = place_batch(mel, tokens, labels)
    new_params, loss = step(sp, smel, stok, slab)
    jax.block_until_ready(loss)

    assert float(loss) == pytest.approx(ref_loss, rel=1e-4)
    # params actually moved (sgd applied)
    w0 = np.asarray(P.get_leaf(new_params, "decoder.layers.0.attn.q.w"))
    w0_ref = np.asarray(P.get_leaf(params, "decoder.layers.0.attn.q.w"))
    assert not np.allclose(w0, w0_ref)


def test_param_sharding_layout(arch):
    mesh = mesh_lib.make_mesh(dp=2, tp=4)
    params = mesh_lib.shard_params(P.init_params(arch, jax.random.PRNGKey(0)),
                                   mesh)
    qw = P.get_leaf(params, "encoder.layers.0.attn.q.w")
    # column-parallel: output dim split over tp=4
    assert qw.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    fc2 = P.get_leaf(params, "encoder.layers.0.fc2.w")
    assert fc2.sharding.spec == jax.sharding.PartitionSpec("tp", None)


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
