"""Sensitivity-driven mixed-precision quantization (quant/mixed.py)."""

import jax
import numpy as np
import pytest

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.params import named_leaves
from openai_whisper_compression_tpu.ops.qtensor import QTensor
from openai_whisper_compression_tpu.quant import mixed
from openai_whisper_compression_tpu.sensitivity import gradient


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    batches = gradient.make_synthetic_batches(arch, n_batches=1, batch=2,
                                              seq=8)
    scores = gradient.compute_sensitivity(params, arch, batches)
    return params, arch, scores


def test_generate_quant_config_budget(setup):
    params, arch, scores = setup
    leaves = mixed.quantizable_leaves(params)
    assert leaves and all(n for n, _ in leaves)

    cfg = mixed.generate_quant_config(params, scores, target_bits=6.0)
    assert cfg["avg_bits"] <= 6.0
    assert set(cfg["assignments"]) == {n for n, _ in leaves}
    assert set(cfg["counts"]) == {"int4", "int8"}
    assert cfg["counts"]["int4"] > 0 and cfg["counts"]["int8"] > 0

    # extremes: budget >= top rung keeps everything wide; the floor is
    # reachable; below-floor rejects
    hi = mixed.generate_quant_config(params, scores, target_bits=8.0)
    assert hi["counts"]["int4"] == 0
    lo = mixed.generate_quant_config(params, scores, target_bits=4.0)
    assert lo["counts"]["int8"] == 0
    with pytest.raises(ValueError, match="floor"):
        mixed.generate_quant_config(params, scores, target_bits=3.0)
    with pytest.raises(ValueError, match="ascending"):
        mixed.generate_quant_config(params, scores,
                                    ladder=("int8", "int4"))
    with pytest.raises(KeyError, match="ladder method"):
        mixed.generate_quant_config(params, scores, ladder=("int4", "bogus"))


def test_budget_protects_sensitive_leaves(setup):
    """The widest rung goes to the highest-sensitivity leaves: every int8
    assignee scores at least every int4 assignee (ties aside)."""
    params, arch, scores = setup
    cfg = mixed.generate_quant_config(params, scores, target_bits=6.0)
    s8 = [scores[n] for n, m in cfg["assignments"].items() if m == "int8"]
    s4 = [scores[n] for n, m in cfg["assignments"].items() if m == "int4"]
    assert min(s8) >= max(s4) - 1e-12


def test_three_rung_ladder(setup):
    params, arch, scores = setup
    cfg = mixed.generate_quant_config(params, scores, target_bits=4.5,
                                      ladder=("int2", "nf4", "int8"))
    assert cfg["avg_bits"] <= 4.5
    assert sum(cfg["counts"].values()) == len(cfg["assignments"])


def test_apply_and_roundtrip(setup, tmp_path):
    params, arch, scores = setup
    cfg = mixed.generate_quant_config(params, scores, target_bits=6.0)
    path = mixed.save_quant_config(cfg, str(tmp_path / "q.json"))
    qp = mixed.apply_quant_config(params, mixed.load_quant_config(path))
    kinds = {}
    for name, leaf in named_leaves(qp):
        if isinstance(leaf, QTensor):
            kinds[name] = leaf.kind
    assert set(kinds) == set(cfg["assignments"])
    for name, method in cfg["assignments"].items():
        want = "int4_pack" if method == "int4" else "int8_pc"
        assert kinds[name] == want, name
    # mixed model runs and sits between uniform int4 and int8 in size
    from openai_whisper_compression_tpu.models.params import size_in_mb
    from openai_whisper_compression_tpu.models.whisper import forward
    from openai_whisper_compression_tpu.quant.api import quantize_params

    mel = np.zeros((1, arch.num_mel_bins, 2 * arch.max_source_positions),
                   np.float32)
    toks = np.asarray([[arch.decoder_start_token_id, 1, 2]])
    out = jax.jit(lambda p, m, t: forward(p, arch, m, t))(
        qp, mel, toks)
    assert np.isfinite(np.asarray(out)).all()
    sz = size_in_mb(qp)
    sz4 = size_in_mb(quantize_params(params, "int4"))
    sz8 = size_in_mb(quantize_params(params, "int8"))
    assert sz4 < sz < sz8


def test_cli_sensitivity_quant_bits(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    path = tmp_path / "qcfg.json"
    cli.main(["sensitivity", "--model", "test2l", "--method", "gradient",
              "--batches", "1", "--batch-size", "2",
              "--quant-bits", "6", "--save-path", str(path)])
    assert "avg_bits" in capsys.readouterr().out
    assert path.exists()
    cli.main(["evaluate", "--model", "test2l", "--samples", "2",
              "--batch-size", "2", "--max-new-tokens", "4",
              "--quant-config", str(path)])
    out = capsys.readouterr().out
    assert "mixed-precision" in out and "WER" in out


def test_mixed_precision_sweep_through_driver(tmp_path):
    """Budget-ladder sweep: model size decreases monotonically with the
    bits budget; scores computed once and shared (cache)."""
    from openai_whisper_compression_tpu.config import EvalConfig, DecodeConfig
    from openai_whisper_compression_tpu.evaluation.data import prepare_datasets
    from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
    from openai_whisper_compression_tpu.sweep import configs as sweep_configs
    from openai_whisper_compression_tpu.sweep.driver import run_sweep

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    datasets = prepare_datasets(num_cal=2, num_test=2)
    tok = WordTokenizer(arch.vocab_size,
                        special_start=min(arch.eos_token_id,
                                          arch.decoder_start_token_id))
    cfgs = sweep_configs.mixed_precision_sweep(budgets=(4.0, 6.0, 8.0))
    assert [c["name"] for c in cfgs] == [
        "baseline_fp32", "mixed_4.0b", "mixed_6.0b", "mixed_8.0b"]
    results = run_sweep(params, arch, cfgs, datasets, tok,
                        eval_cfg=EvalConfig(batch_size=2, warmup_batches=0),
                        decode_cfg=DecodeConfig(max_new_tokens=4),
                        save_path=str(tmp_path))
    for c in cfgs:
        assert "error" not in results[c["name"]], results[c["name"]]
    sizes = [results[f"mixed_{b}b"]["model_size_mb"] for b in (4.0, 6.0, 8.0)]
    assert sizes[0] < sizes[1] < sizes[2]
    assert sizes[2] < results["baseline_fp32"]["model_size_mb"]


def test_apply_quant_config_rejects_foreign_config(setup):
    """A config whose assignments don't exist in the params tree raises
    instead of silently leaving weights dense."""
    params, arch, scores = setup
    cfg = mixed.generate_quant_config(params, scores, target_bits=6.0)
    cfg["assignments"]["decoder.blocks.99.fake.w"] = "int8"
    with pytest.raises(KeyError, match="absent from params"):
        mixed.apply_quant_config(params, cfg)
