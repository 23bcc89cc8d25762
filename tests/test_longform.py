"""Long-form chunked transcription + top-level API tests."""

import numpy as np
import pytest

import jax

from openai_whisper_compression_tpu import load_model, prune, quantize, transcribe
from openai_whisper_compression_tpu.config import DecodeConfig
from openai_whisper_compression_tpu.evaluation.harness import samples_for_arch
from openai_whisper_compression_tpu.evaluation.longform import chunk_waveform


def test_chunking():
    n = 1000
    wav = np.ones(3 * n + 17, np.float32)
    chunks = chunk_waveform(wav, n)
    assert len(chunks) == 4
    assert sum(len(c) for c in chunks) == len(wav)
    assert len(chunk_waveform(np.ones(5, np.float32), n)) == 1
    # overlap produces more chunks
    assert len(chunk_waveform(wav, n, overlap=0.5)) > 4


def test_transcribe_long_api():
    params, arch = load_model("test2l")
    n = samples_for_arch(arch)
    g = np.random.default_rng(0)
    wav = g.standard_normal(int(2.5 * n)).astype(np.float32) * 0.1

    cfg = DecodeConfig(max_new_tokens=4, language_token_id=None,
                       task_token_id=None, notimestamps=False)
    res = transcribe(params, arch, wav, decode_cfg=cfg, batch_size=2)
    assert res["num_chunks"] == 3
    assert len(res["chunks"]) == 3
    assert res["audio_seconds"] == pytest.approx(len(wav) / 16000.0)
    assert isinstance(res["text"], str)


def test_top_level_compose():
    params, arch = load_model("test2l")
    compressed = quantize(prune(params, amount=0.5), "int8")
    from openai_whisper_compression_tpu.models.params import size_in_mb

    assert size_in_mb(compressed) < size_in_mb(params)
    from openai_whisper_compression_tpu.prune.recipe import DEFAULT_RECIPE

    recipe_pruned = prune(params, arch, recipe=DEFAULT_RECIPE)
    from openai_whisper_compression_tpu.prune.magnitude import sparsity_report

    assert sparsity_report(recipe_pruned)["overall_sparsity"] > 0.1
