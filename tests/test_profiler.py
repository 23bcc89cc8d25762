"""Per-sample eval stack (evaluation/profiler.py) — notebook-layer parity
tests (reference `openai_whisper_compression/utils.py`)."""

import csv
import os

import numpy as np
import pytest

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.evaluation.data import synthetic_dataset
from openai_whisper_compression_tpu.evaluation.profiler import (
    ModelProfiler, TranscriptionMetrics, VisualizationUtils, WhisperEvaluator,
    format_time, setup_device)
from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
from openai_whisper_compression_tpu.models import params as P


@pytest.fixture(scope="module")
def small_model():
    import jax

    arch = ARCHS["test2l"]
    return arch, P.init_params(arch, jax.random.PRNGKey(0))


def test_setup_device_and_format_time(capsys):
    dev = setup_device()
    assert dev.platform == "cpu"  # conftest forces CPU
    assert "CPU" in capsys.readouterr().out
    assert format_time(12.3) == "12.30s"
    assert format_time(90) == "1.50m"
    assert format_time(7200) == "2.00h"


def test_model_profiler_sizes(small_model):
    arch, params = small_model
    prof = ModelProfiler("test2l")
    total = prof.measure_model_size(params)
    details = prof.get_detailed_model_size(params)
    assert details["total_size_mb"] == pytest.approx(total, rel=1e-6)
    assert details["total_params"] == P.leaf_count(params)
    assert "encoder.layers.0.fc1.w" in details["layer_info"]
    prof.print_size_analysis(top_k=3)  # must not raise


def test_model_profiler_quantized_sizes(small_model):
    """Quantized leaves report packed physical bytes, not logical fp32."""
    from openai_whisper_compression_tpu.quant.api import quantize_params

    arch, params = small_model
    prof = ModelProfiler("q")
    d8 = prof.get_detailed_model_size(quantize_params(params, "int8"))
    d32 = prof.get_detailed_model_size(params)
    # embeddings/norms stay fp32 in test2l, so total shrinks but not 4x;
    # the quantized leaf itself must be ~4x smaller (int8 + fp scales)
    assert d8["total_size_mb"] < 0.6 * d32["total_size_mb"]
    assert d8["total_params"] == d32["total_params"]
    leaf = "encoder.layers.0.fc1.w"
    assert d8["layer_info"][leaf]["type"].startswith("quantized:")
    assert d8["layer_info"][leaf]["size_mb"] < \
        0.3 * d32["layer_info"][leaf]["size_mb"]


def test_error_metrics_normalized():
    w, c = ModelProfiler.calculate_error_metrics("Hello, World!", "hello world")
    assert w == 0.0 and c == 0.0
    w, c = ModelProfiler.calculate_error_metrics("a b c d", "a b x d")
    assert w == pytest.approx(0.25)


def test_evaluator_end_to_end(small_model, tmp_path):
    arch, params = small_model
    data = synthetic_dataset(3, seed=2, vocab_size=500,
                             min_dur=1.0, max_dur=2.0)
    tok = WordTokenizer(arch.vocab_size, special_start=997)
    prof = ModelProfiler("test2l", results_dir=str(tmp_path))
    ev = WhisperEvaluator(
        params, arch, tok, prof,
        DecodeConfig(max_new_tokens=6, language_token_id=None,
                     task_token_id=None, notimestamps=False))
    records = ev.evaluate_dataset(data)
    assert len(records) == 3
    for i, r in enumerate(records):
        assert r["sample_id"] == i
        assert 0.0 <= r["wer"]
        assert r["inference_time"] > 0
        assert isinstance(r["hypothesis"], str)
    assert len(prof.metrics_history) == 3

    # metric CSV round-trip
    path = prof.save_metrics("metrics.csv")
    with open(path) as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3 and "wer" in rows[0]

    # summary + persistence + console paths
    summary = TranscriptionMetrics.calculate_summary_metrics(
        records, model_size=prof.measure_model_size(params))
    assert set(summary) >= {"avg_wer", "median_wer", "std_wer", "avg_cer",
                            "avg_inference_time", "avg_memory_used",
                            "model_size_mb"}
    spath = TranscriptionMetrics.save_summary(summary,
                                              str(tmp_path / "summary.csv"))
    assert os.path.exists(spath)
    TranscriptionMetrics.print_summary(summary)
    TranscriptionMetrics.print_sample_comparisons(records, 2)

    # plots
    p1 = VisualizationUtils.plot_error_distributions(
        records, str(tmp_path / "err.png"))
    p2 = VisualizationUtils.plot_performance_metrics(
        records, str(tmp_path / "perf.png"))
    assert os.path.getsize(p1) > 0 and os.path.getsize(p2) > 0

    # checkpoint save
    out = ev.save_model(str(tmp_path / "model"))
    assert os.path.exists(out)
