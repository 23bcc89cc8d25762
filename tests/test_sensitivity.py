"""Sensitivity suite tests: gradient/Fisher scorers, head importance,
activation stats, recommendation generator, architecture analyzer."""

import json

import numpy as np
import pytest

import jax

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.sensitivity import (activation,
                                                        architecture,
                                                        gradient, heads,
                                                        recommend)


@pytest.fixture(scope="module")
def model():
    arch = ARCHS["test2l"]
    return P.init_params(arch, jax.random.PRNGKey(0)), arch


@pytest.fixture(scope="module")
def batches(model):
    _, arch = model
    return gradient.make_synthetic_batches(arch, n_batches=2, batch=2, seq=6,
                                           mel_frames=64)


def test_gradient_sensitivity(model, batches):
    params, arch = model
    scores = gradient.compute_sensitivity(params, arch, batches)
    assert "decoder.layers.0.attn.q.w" in scores
    assert all(v >= 0 for v in scores.values())
    assert any(v > 0 for v in scores.values())
    norm = gradient.normalize_scores(scores)
    assert 0.0 <= min(norm.values()) and max(norm.values()) == 1.0
    agg = gradient.aggregate(norm)
    assert "decoder_self_attention" in agg["by_category"]
    assert "encoder.0" in agg["by_layer"]


def test_fisher_vs_gradient(model, batches):
    params, arch = model
    g1 = gradient.compute_sensitivity(params, arch, batches, power=1.0)
    g2 = gradient.compute_fisher_sensitivity(params, arch, batches)
    # fisher = grad^2: different scale, same keys
    assert set(g1) == set(g2)
    k = "decoder.layers.0.fc1.w"
    assert g2[k] != g1[k]


def test_head_importance(model, batches):
    params, arch = model
    imp = heads.head_importance(params, arch, batches, kind="encoder")
    assert imp.shape == (arch.encoder_layers, arch.encoder_heads)
    assert np.any(imp != 0)
    drop = heads.least_important_heads(imp, 0.5)
    assert all(len(v) == 2 for v in drop.values())  # 4 heads -> drop 2

    # importance-guided physical pruning end-to-end
    from openai_whisper_compression_tpu.prune.structured import prune_heads

    pruned = prune_heads(params, arch, {"encoder.attn": drop}, physical=True)
    qw = P.get_leaf(pruned, "encoder.layers.0.attn.q.w")
    assert qw.shape[1] == 2 * arch.head_dim


def test_cross_head_importance_runs(model, batches):
    params, arch = model
    imp = heads.head_importance(params, arch, batches[:1], kind="cross")
    assert imp.shape == (arch.decoder_layers, arch.decoder_heads)


def test_activation_stats_and_prune(model, batches):
    params, arch = model
    stats = activation.collect_ffn_stats(params, arch, batches)
    assert len(stats) == arch.encoder_layers + arch.decoder_layers
    assert stats[0]["component"] == "encoder"
    assert stats[-1]["component"] == "decoder"
    assert stats[0]["per_unit_mean_abs"].shape == (arch.ffn_dim,)
    assert stats[0]["mean_abs"] > 0

    pruned = activation.activation_guided_ffn_prune(params, arch, batches,
                                                    keep_fraction=0.25)
    w1 = P.get_leaf(pruned, "encoder.layers.0.fc1.w")
    assert w1.shape[1] == arch.ffn_dim // 4


def test_recommendation_generator(model, batches, tmp_path):
    params, arch = model
    scores = gradient.compute_sensitivity(params, arch, batches)
    cfg = recommend.generate_pruning_config(scores, arch)
    r = cfg["recipe"]
    assert r["layernorm"] == 0.0 and r["bias"] == 0.0
    assert any(v > 0 for v in r.values())
    assert all(0 <= v <= 0.95 for v in r.values())
    assert {"decoder_ffn_first", "decoder_ffn_middle",
            "decoder_ffn_last"} <= set(r)

    path = recommend.save_pruning_config(cfg, str(tmp_path / "cfg.json"))
    loaded = json.loads(open(path).read())

    # generated recipe is consumable by the recipe engine
    from openai_whisper_compression_tpu.prune import magnitude, recipe

    pruned = recipe.apply_recipe(params, arch, loaded["recipe"])
    rep = magnitude.sparsity_report(pruned)
    assert rep["overall_sparsity"] > 0.02


def test_architecture_analyzer(model, tmp_path):
    params, arch = model
    a = architecture.analyze_model(params)
    assert a["total_params"] == P.leaf_count(params)
    assert "decoder_self_attention" in a["by_category"]
    table = architecture.format_table(a)
    assert "TOTAL" in table
    csv_text = architecture.to_csv(a, str(tmp_path / "arch.csv"))
    assert "decoder.layers.0.attn.q.w" in csv_text
    # quantized models analyzable too
    from openai_whisper_compression_tpu.quant import api as quant_api

    qa = architecture.analyze_model(quant_api.quantize_params(params, "int8"))
    assert qa["total_params"] == a["total_params"]
    assert qa["size_mb"] < a["size_mb"]
