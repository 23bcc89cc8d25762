"""Pruning lab tests: sparsity invariants, targeted filters, recipe engine,
structured shrinking (heads/FFN/layers), GFLOPs estimator."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.whisper import encode, forward
from openai_whisper_compression_tpu.prune import (flops, magnitude, recipe,
                                                  structured, targeted)


@pytest.fixture(scope="module")
def model():
    arch = ARCHS["test2l"]
    return P.init_params(arch, jax.random.PRNGKey(0)), arch


def _fwd(params, arch, seed=2):
    g = np.random.default_rng(seed)
    mel = jnp.asarray(g.standard_normal((1, arch.num_mel_bins, 64)), jnp.float32)
    tokens = jnp.asarray([[arch.decoder_start_token_id, 3, 7, 9]])
    return forward(params, arch, mel, tokens)


def test_global_l1_sparsity(model):
    params, arch = model
    base_bias = magnitude.sparsity_report(params)["bias_sparsity"]
    for amount in (0.3, 0.7):
        pruned = magnitude.prune_global_l1(params, amount)
        rep = magnitude.sparsity_report(pruned, magnitude.linear_weights)
        assert rep["overall_sparsity"] == pytest.approx(amount, abs=0.02)
        # untouched categories unchanged (biases init at zero -> compare)
        full = magnitude.sparsity_report(pruned)
        assert full["bias_sparsity"] == pytest.approx(base_bias, abs=1e-6)
    # original linear weights untouched
    assert magnitude.sparsity_report(
        params, magnitude.linear_weights)["overall_sparsity"] < 0.01


def test_per_module_vs_global(model):
    params, _ = model
    pm = magnitude.prune_per_module_l1(params, 0.5)
    rep = magnitude.sparsity_report(pm, magnitude.linear_weights)
    # every leaf individually at 50%
    for n, d in rep["per_leaf"].items():
        assert d["sparsity"] == pytest.approx(0.5, abs=0.01), n


def test_random_and_block(model):
    params, _ = model
    pr = magnitude.prune_random(params, 0.4, seed=1)
    rep = magnitude.sparsity_report(pr, magnitude.linear_weights)
    assert rep["overall_sparsity"] == pytest.approx(0.4, abs=0.05)

    pb = magnitude.prune_blocks(params, 0.5, block=(4, 4))
    rep = magnitude.sparsity_report(pb, magnitude.linear_weights)
    assert rep["overall_sparsity"] == pytest.approx(0.5, abs=0.03)
    # block structure: zeros come in 4x4 tiles
    w = P.get_leaf(pb, "encoder.layers.0.fc1.w")
    blocks = np.asarray(w).reshape(w.shape[0] // 4, 4, w.shape[1] // 4, 4)
    per_block_zero = (blocks == 0).all(axis=(1, 3))
    per_block_nonzero = (blocks != 0).any(axis=(1, 3))
    assert np.all(per_block_zero | per_block_nonzero)


def test_targeted_filters(model):
    params, arch = model
    cases = [
        (targeted.encoder_only, "encoder.layers.0.attn.q.w", "decoder.layers.0.attn.q.w"),
        (targeted.ffn_decoder, "decoder.layers.1.fc1.w", "encoder.layers.1.fc1.w"),
        (targeted.cross_attn_decoder, "decoder.layers.0.cross.q.w", "decoder.layers.0.attn.q.w"),
        (targeted.conv_layers, "encoder.conv1.w", "encoder.layers.0.fc1.w"),
        (targeted.token_embeddings, "decoder.embed", "decoder.pos"),
        (targeted.bias_only, "decoder.layers.0.attn.q.b", "decoder.layers.0.attn.q.w"),
        (targeted.layernorm_only, "encoder.layers.0.attn_ln.g", "encoder.conv1.b"),
    ]
    for f, pos, neg in cases:
        assert f(pos), (f.__name__, pos)
        assert not f(neg), (f.__name__, neg)

    pruned = magnitude.prune_per_module_l1(params, 0.5,
                                           name_filter=targeted.encoder_only)
    rep = magnitude.sparsity_report(pruned)
    assert rep["per_leaf"]["encoder.layers.0.attn.q.w"]["sparsity"] > 0.45
    assert rep["per_leaf"]["decoder.layers.0.attn.q.w"]["sparsity"] < 0.01

    sec = targeted.layer_section("encoder", "early", arch.encoder_layers, window=1)
    assert sec("encoder.layers.0.fc1.w") and not sec("encoder.layers.1.fc1.w")


def test_recipe_engine(model):
    params, arch = model
    assert recipe.determine_pruning_amount(
        "encoder.layers.0.fc1.w", arch) == 0.50
    assert recipe.determine_pruning_amount(
        "decoder.layers.0.attn.q.w", arch) == 0.50
    assert recipe.determine_pruning_amount(
        "decoder.layers.0.cross.q.w", arch) == 0.45
    assert recipe.determine_pruning_amount(
        "encoder.layers.0.attn_ln.g", arch) == 0.0
    assert recipe.determine_pruning_amount("decoder.embed", arch) == 0.25

    pruned = recipe.apply_recipe(params, arch)
    rep = magnitude.sparsity_report(pruned)
    assert rep["per_leaf"]["encoder.layers.0.fc1.w"]["sparsity"] == pytest.approx(0.5, abs=0.01)
    assert rep["per_leaf"]["decoder.embed"]["sparsity"] == pytest.approx(0.25, abs=0.01)
    assert rep["per_leaf"]["decoder.pos"]["sparsity"] == 0.0
    comp = magnitude.component_sparsity(pruned)
    assert comp["encoder_ffn"] == pytest.approx(0.5, abs=0.05)
    # model still runs
    out = _fwd(pruned, arch)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_l2_structured(model):
    params, arch = model
    pruned = structured.prune_l2_structured(params, 0.5)
    w = np.asarray(P.get_leaf(pruned, "encoder.layers.0.fc1.w"))
    col_zero = (w == 0).all(axis=0)
    assert col_zero.mean() == pytest.approx(0.5, abs=0.05)
    out = _fwd(pruned, arch)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_head_pruning_physical(model):
    params, arch = model
    pruned = structured.prune_heads(
        params, arch,
        {"encoder.attn": {0: [1, 3]}, "decoder.cross": {1: [0]}},
        physical=True)
    qw = P.get_leaf(pruned, "encoder.layers.0.attn.q.w")
    assert qw.shape == (arch.d_model, 2 * arch.head_dim)  # 4 -> 2 heads
    ow = P.get_leaf(pruned, "encoder.layers.0.attn.o.w")
    assert ow.shape == (2 * arch.head_dim, arch.d_model)
    cw = P.get_leaf(pruned, "decoder.layers.1.cross.q.w")
    assert cw.shape == (arch.d_model, 3 * arch.head_dim)
    out = _fwd(pruned, arch)
    assert bool(jnp.all(jnp.isfinite(out)))

    # physical == masked numerics: same heads zeroed gives same output
    masked = structured.prune_heads(
        params, arch, {"encoder.attn": {0: [1, 3]}}, physical=False)
    phys = structured.prune_heads(
        params, arch, {"encoder.attn": {0: [1, 3]}}, physical=True)
    np.testing.assert_allclose(np.asarray(encode(masked, arch, jnp.zeros((1, 80, 64)))),
                               np.asarray(encode(phys, arch, jnp.zeros((1, 80, 64)))),
                               atol=1e-5)


def test_head_pruning_by_l1_and_decode(model):
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.models import decode

    params, arch = model
    pruned = structured.prune_heads_by_l1(params, arch, 0.5)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((1, arch.num_mel_bins, 64)), jnp.float32)
    enc = encode(pruned, arch, mel)
    tokens, lengths = decode.greedy_decode(
        pruned, arch, enc, DecodeConfig(max_new_tokens=4, language_token_id=None,
                                        task_token_id=None, notimestamps=False))
    assert tokens.shape[0] == 1  # KV cache adapted to pruned head counts


def test_ffn_shrink_and_layer_drop(model):
    params, arch = model
    shrunk = structured.shrink_ffn(params, "encoder", 0, 0.5)
    assert P.get_leaf(shrunk, "encoder.layers.0.fc1.w").shape[1] == arch.ffn_dim // 2
    assert P.get_leaf(shrunk, "encoder.layers.0.fc2.w").shape[0] == arch.ffn_dim // 2
    assert bool(jnp.all(jnp.isfinite(_fwd(shrunk, arch))))

    dropped = structured.drop_layers(params, "decoder", [1])
    assert len(dropped["decoder"]["layers"]) == arch.decoder_layers - 1
    assert bool(jnp.all(jnp.isfinite(_fwd(dropped, arch))))

    removed = structured.remove_mlp(params, "encoder", [0])
    assert float(jnp.sum(jnp.abs(
        P.get_leaf(removed, "encoder.layers.0.fc2.w")))) == 0.0


def test_gflops_estimator(model):
    params, arch = model
    base = flops.model_gflops(params, arch)
    assert base["total_gflops"] > 0
    pruned = magnitude.prune_global_l1(params, 0.9)
    less = flops.model_gflops(pruned, arch)
    assert less["total_gflops"] < base["total_gflops"]
    # structured shrink reduces attention flops too
    shrunk = structured.prune_heads_by_l1(params, arch, 0.5)
    s = flops.model_gflops(shrunk, arch)
    assert s["total_gflops"] < base["total_gflops"]


def test_progressive_positional_and_qkv_filter(model):
    params, arch = model
    pruned = magnitude.prune_positional_progressive(params, max_amount=0.6)
    pos = np.asarray(P.get_leaf(pruned, "decoder.pos"))
    first_sparsity = (pos[0] == 0).mean()
    last_sparsity = (pos[-1] == 0).mean()
    assert first_sparsity < 0.05           # early positions untouched
    assert last_sparsity == pytest.approx(0.6, abs=0.1)  # late heavily pruned
    # monotone-ish ramp
    mid = (pos[len(pos) // 2] == 0).mean()
    assert first_sparsity <= mid <= last_sparsity + 0.1

    assert targeted.qkv_projections_only("decoder.layers.0.attn.q.w")
    assert targeted.qkv_projections_only("decoder.layers.0.cross.v.w")
    assert not targeted.qkv_projections_only("decoder.layers.0.attn.o.w")
    qkv_pruned = magnitude.prune_per_module_l1(
        params, 0.5, name_filter=targeted.qkv_projections_only)
    rep = magnitude.sparsity_report(qkv_pruned)
    assert rep["per_leaf"]["encoder.layers.0.attn.q.w"]["sparsity"] > 0.45
    assert rep["per_leaf"]["encoder.layers.0.attn.o.w"]["sparsity"] < 0.01


def test_multihost_noop():
    from openai_whisper_compression_tpu.parallel.multihost import initialize

    info = initialize()
    assert info["initialized"] is False
    assert info["devices"] == 8
