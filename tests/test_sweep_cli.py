"""Sweep driver, plots, and CLI smoke tests (tiny model, synthetic data)."""

import json
import os

import numpy as np
import pytest

import jax

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig, EvalConfig
from openai_whisper_compression_tpu.evaluation.data import prepare_datasets
from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.sweep import configs as sweep_configs
from openai_whisper_compression_tpu.sweep import plots
from openai_whisper_compression_tpu.sweep.driver import run_sweep, summarize


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    datasets = prepare_datasets(num_cal=2, num_test=4, seed=0)
    # shrink audio durations for test speed
    tok = WordTokenizer(arch.vocab_size, special_start=997)
    return params, arch, datasets, tok


def _dc():
    return DecodeConfig(max_new_tokens=4, language_token_id=None,
                        task_token_id=None, notimestamps=False)


def test_config_matrices_complete():
    arch = ARCHS["test2l"]
    assert len(sweep_configs.quant_sweep()) == 22
    assert len(sweep_configs.unstructured_l1_sweep()) == 12
    exp = sweep_configs.experimental_pruning_sweep(arch)
    assert len(exp) >= 30  # reference ~35-config matrix parity
    names = {c["name"] for c in exp}
    assert {"thesis_recipe", "block4x4_50", "heads_l1_25_physical",
            "drop_dec_last_layer", "progressive_layerwise",
            "pos_embedding_position_dependent", "multi_level_enc_heads_dec_mlp",
            "mixed_head30_weight20", "attention_vs_ffn"} <= names
    pq = sweep_configs.prune_quant_sweep()
    assert len(pq) == 18  # reference 15-entry matrix + dq/fp16/bf16 extras
    assert all(c["name"].startswith("pruned+") for c in pq)


def test_experimental_configs_all_apply(setup):
    """Every experimental config must run on the tiny model and return a
    params pytree (new strategies smoke-tested, not just counted)."""
    params, arch, _, _ = setup
    for cfg in sweep_configs.experimental_pruning_sweep(arch):
        out = cfg["apply"](params, arch)
        assert isinstance(out, dict) and "encoder" in out, cfg["name"]


def test_position_dependent_embedding_rates(setup):
    """Reference schedule: early third pruned ~40%, late third ~20%
    (`experimental_pruning.py:1139-1161`)."""
    from openai_whisper_compression_tpu.prune import magnitude

    params, arch, _, _ = setup
    out = magnitude.prune_positional_position_dependent(params, 0.4, 0.2)
    pos = np.asarray(out["decoder"]["pos"], np.float32)
    t = pos.shape[0]
    early = (pos[: t // 3] == 0).mean()
    late = (pos[2 * t // 3:] == 0).mean()
    assert 0.3 < early < 0.5 and 0.1 < late < 0.3
    assert early > late  # early positions pruned harder


def test_run_sweep_with_fault_isolation(setup, tmp_path):
    params, arch, datasets, tok = setup
    configs = [
        {"name": "baseline", "apply": lambda p, a: p},
        {"name": "int8", "apply": lambda p, a: __import__(
            "openai_whisper_compression_tpu.quant.api",
            fromlist=["api"]).quantize_params(p, "int8")},
        {"name": "boom", "apply": lambda p, a: 1 / 0},  # must not kill sweep
    ]
    results = run_sweep(params, arch, configs, datasets, tok,
                        eval_cfg=EvalConfig(batch_size=2, warmup_batches=0),
                        decode_cfg=_dc(), save_path=str(tmp_path))
    assert set(results) == {"baseline", "int8", "boom"}
    assert "error" in results["boom"]
    assert results["baseline"]["splits"]["test_clean"]["wer"] is not None
    assert results["int8"]["model_size_mb"] < results["baseline"]["model_size_mb"]
    # offline accuracy axis: each non-baseline config reports WER against
    # the baseline config's transcripts
    s_int8 = results["int8"]["splits"]["test_clean"]
    assert isinstance(s_int8["wer_vs_baseline"], float)
    assert 0.0 <= s_int8["exact_match_vs_baseline"] <= 1.0
    assert "wer_vs_baseline" not in results["baseline"]["splits"]["test_clean"]
    saved = json.loads((tmp_path / "all_results.json").read_text())
    assert "boom" in saved

    out = summarize(results)
    assert "baseline" in out and "ERROR" in out

    paths = plots.plot_sweep(results, str(tmp_path), prefix="t")
    assert len(paths) == 4  # incl. the wer-vs-baseline drift plot
    assert all(os.path.exists(p) for p in paths)


def test_run_sweep_resume(setup, tmp_path):
    """Completed configs are skipped on rerun; failed ones retry; results
    are flushed incrementally after every config."""
    params, arch, datasets, tok = setup
    calls = {"good": 0, "flaky": 0}

    def good(p, a):
        calls["good"] += 1
        return p

    def flaky(p, a):
        calls["flaky"] += 1
        if calls["flaky"] == 1:
            raise RuntimeError("transient")
        return p

    configs = [{"name": "good", "apply": good},
               {"name": "flaky", "apply": flaky}]
    kw = dict(eval_cfg=EvalConfig(batch_size=2, warmup_batches=0),
              decode_cfg=_dc(), save_path=str(tmp_path))
    r1 = run_sweep(params, arch, configs, datasets, tok, **kw)
    assert "error" in r1["flaky"] and "error" not in r1["good"]
    # incremental flush happened even though 'flaky' errored
    saved = json.loads((tmp_path / "all_results.json").read_text())
    assert set(saved) == {"good", "flaky", "_meta"}
    assert "_meta" not in r1  # meta is a disk-only artifact

    r2 = run_sweep(params, arch, configs, datasets, tok, **kw)
    assert calls["good"] == 1          # skipped on resume
    assert calls["flaky"] == 2         # retried and succeeded
    assert "error" not in r2["flaky"]

    # a changed decode config invalidates the fingerprint -> full rerun
    kw2 = dict(kw)
    kw2["decode_cfg"] = DecodeConfig(max_new_tokens=5,
                                     language_token_id=None,
                                     task_token_id=None, notimestamps=False)
    run_sweep(params, arch, configs, datasets, tok, **kw2)
    assert calls["good"] == 2          # stale results were NOT reused

    r3 = run_sweep(params, arch, configs, datasets, tok, resume=False, **kw)
    assert calls["good"] == 3          # resume=False reruns everything
    assert "error" not in r3["flaky"]


def test_cli_evaluate_and_analyze(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["evaluate", "--model", "test2l", "--samples", "4",
              "--batch-size", "2", "--max-new-tokens", "4",
              "--quant", "quanto_int8"])
    out = capsys.readouterr().out
    assert "WER" in out

    cli.main(["analyze", "--model", "test2l",
              "--save-path", str(tmp_path / "arch.csv")])
    out = capsys.readouterr().out
    assert "TOTAL" in out
    assert (tmp_path / "arch.csv").exists()


def test_cli_compress_verify(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["compress", "--model", "test2l", "--save",
              str(tmp_path / "m.zip"), "--verify", "--quant", "quanto_int8"])
    out = capsys.readouterr().out
    assert "roundtrip OK" in out


def test_cli_sensitivity(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["sensitivity", "--model", "test2l", "--batches", "1",
              "--batch-size", "1",
              "--save-path", str(tmp_path / "cfg.json")])
    assert (tmp_path / "cfg.json").exists()
    cfg = json.loads((tmp_path / "cfg.json").read_text())
    assert "recipe" in cfg


def test_plot_metric_curves(tmp_path):
    """Per-metric per-split curves (reference create_plots parity)."""
    results = {
        f"p{i}": {
            "model_size_mb": 1.0, "sparsity": i / 10, "gflops": 1.0,
            "splits": {
                "test_clean": {"wer": 0.1 * i, "cer": 0.05 * i, "rtf": 0.01,
                               "rtfx": 100 - i, "avg_latency_per_batch_s": 0.1},
                "test_other": {"wer": 0.12 * i, "cer": 0.06 * i, "rtf": 0.01,
                               "rtfx": 90 - i, "avg_latency_per_batch_s": 0.1},
            },
        }
        for i in range(4)
    }
    results["boom"] = {"error": "x"}
    paths = plots.plot_metric_curves(results, str(tmp_path))
    assert len(paths) == 5
    assert all(os.path.getsize(p) > 0 for p in paths)

    # constant sparsity -> config-index axis, still plots
    for r in results.values():
        if "sparsity" in r:
            r["sparsity"] = 0.0
    paths = plots.plot_metric_curves(results, str(tmp_path), prefix="c2")
    assert len(paths) == 5


def test_data_aware_sweep_through_driver(setup, tmp_path):
    """GPTQ/SmoothQuant/AWQ run end-to-end through the sweep driver: the
    driver builds the eager calibration callable from the calibration
    split and each config returns a QTensor-bearing pytree."""
    from openai_whisper_compression_tpu.models.params import named_leaves
    from openai_whisper_compression_tpu.ops.qtensor import QTensor

    params, arch, datasets, tok = setup
    cfgs = sweep_configs.data_aware_sweep()
    names = {c["name"] for c in cfgs}
    assert {"baseline_fp32", "gptq_int2", "gptq_int4", "gptq_int8",
            "smoothquant_int4", "smoothquant_int8", "smoothquant_w8a8",
            "awq_int4", "awq_nf4"} == names
    want = {"baseline_fp32", "gptq_int8", "smoothquant_w8a8", "awq_int4"}
    sub = [c for c in cfgs if c["name"] in want]
    results = run_sweep(params, arch, sub, datasets, tok,
                        eval_cfg=EvalConfig(batch_size=2, warmup_batches=0),
                        decode_cfg=_dc(), save_path=str(tmp_path))
    for n in want:
        assert "error" not in results[n], results[n]
        assert results[n]["splits"]["test_clean"]["wer"] is not None
    base_mb = results["baseline_fp32"]["model_size_mb"]
    assert results["gptq_int8"]["model_size_mb"] < base_mb
    assert results["awq_int4"]["model_size_mb"] < base_mb

    # the apply transforms actually produced QTensor linears
    from openai_whisper_compression_tpu.evaluation import harness
    from openai_whisper_compression_tpu.quant import api as quant_api

    run_cal = harness.make_calibration_fn(arch,
                                          datasets["calibration_clean"], tok,
                                          batch_size=2)
    qp = quant_api.quantize_data_aware(params, arch, "smoothquant_w8a8",
                                       run_cal)
    kinds = {l.kind for _, l in named_leaves(qp) if isinstance(l, QTensor)}
    assert kinds == {"int8_pc"}
    acts = {l.act for _, l in named_leaves(qp) if isinstance(l, QTensor)}
    assert acts == {"dynamic_int8"}

    with pytest.raises(KeyError, match="data-aware"):
        quant_api.quantize_data_aware(params, arch, "nope", run_cal)


def test_make_calibration_fn_feeds_both_taps(setup):
    """One callable serves both instrumentation channels: SmoothQuant's
    LN-output capture sees a well-formed record stream, and GPTQ's linear
    tap accumulates Hessians for every linear weight."""
    from openai_whisper_compression_tpu.evaluation import harness
    from openai_whisper_compression_tpu.quant import gptq, smooth

    params, arch, datasets, tok = setup
    run_cal = harness.make_calibration_fn(arch,
                                          datasets["calibration_clean"], tok,
                                          batch_size=2, n_tokens=6)
    stats = smooth.collect_ln_stats(params, arch, run_cal)
    n_sites = 2 * arch.encoder_layers + 3 * arch.decoder_layers
    assert len(stats) == n_sites
    hes = gptq.collect_hessians(params, run_cal)
    assert any(k.endswith(".fc1.w") for k in hes)
    assert any(".attn.q.w" in k for k in hes)

    with pytest.raises(ValueError, match=">= 1"):
        harness.make_calibration_fn(arch, [], tok)


def test_cli_evaluate_data_aware(capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["evaluate", "--model", "test2l", "--samples", "2",
              "--batch-size", "2", "--max-new-tokens", "4",
              "--calibration-samples", "2", "--quant", "gptq_int4"])
    assert "WER" in capsys.readouterr().out


def test_shard_configs_round_robin():
    """Multi-host fan-out: disjoint cover of non-baseline configs, baseline
    replicated to every host, topology defaults from live JAX."""
    from openai_whisper_compression_tpu.sweep.driver import shard_configs

    cfgs = ([{"name": "baseline_fp32"}]
            + [{"name": f"c{i}"} for i in range(7)])
    shards = [shard_configs(cfgs, process_id=i, num_processes=3)
              for i in range(3)]
    for s in shards:
        assert s[0]["name"] == "baseline_fp32"
    names = [n["name"] for s in shards for n in s[1:]]
    assert sorted(names) == [f"c{i}" for i in range(7)]
    assert len(set(names)) == 7                       # disjoint
    # single process → unchanged; bad ids reject
    assert shard_configs(cfgs, process_id=0, num_processes=1) == cfgs
    with pytest.raises(ValueError, match="outside"):
        shard_configs(cfgs, process_id=3, num_processes=3)
    # no-baseline matrices shard fully
    nb = shard_configs(cfgs[1:], process_id=0, num_processes=2)
    assert all(not c["name"].startswith("baseline") for c in nb)
    # live-topology default (single test process) is identity
    assert shard_configs(cfgs) == cfgs


def test_host_sharded_sweep_and_merge(setup, tmp_path):
    """Two simulated hosts run disjoint config shards into host<i>/ dirs;
    merge_host_results reassembles the full matrix."""
    from openai_whisper_compression_tpu.sweep.driver import (
        merge_host_results, shard_configs)

    params, arch, datasets, tok = setup
    cfgs = sweep_configs.quant_sweep()[:5]
    assert cfgs[0]["name"] == "baseline_fp32"
    for pid in range(2):
        mine = shard_configs(cfgs, process_id=pid, num_processes=2)
        run_sweep(params, arch, mine, datasets, tok,
                  eval_cfg=EvalConfig(batch_size=2, warmup_batches=0),
                  decode_cfg=_dc(),
                  save_path=str(tmp_path / f"host{pid}"))
    merged = merge_host_results(str(tmp_path))
    assert set(merged) == {c["name"] for c in cfgs}
    for name, entry in merged.items():
        assert "error" not in entry, entry
    import json
    with open(tmp_path / "all_results.json") as f:
        on_disk = json.load(f)
    assert set(on_disk) == set(merged) | {"_meta"}

    with pytest.raises(FileNotFoundError):
        merge_host_results(str(tmp_path / "nope"))


def test_shard_configs_replicates_0pct_anchor():
    """Pruning sweeps anchor wer_vs_baseline to the *_0pct config; sharding
    must replicate that anchor to every host, same as baseline_*."""
    from openai_whisper_compression_tpu.sweep.driver import shard_configs

    cfgs = [{"name": f"l1_global_{p}pct"} for p in (0, 10, 30, 50, 90)]
    shards = [shard_configs(cfgs, process_id=i, num_processes=2)
              for i in range(2)]
    for s in shards:
        assert s[0]["name"] == "l1_global_0pct"
    rest = [c["name"] for s in shards for c in s[1:]]
    assert sorted(rest) == sorted(c["name"] for c in cfgs[1:])
