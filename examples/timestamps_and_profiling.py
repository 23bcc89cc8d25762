"""Timestamp-segmented transcription + per-sample profiling walkthrough.

Shows the two newer surfaces on top of the compression pipeline:
- OpenAI timestamp decoding rules + seek-based long-form transcription
  (`evaluation.longform.transcribe_seek`): segments with start/end times;
- the per-sample eval stack (`evaluation.profiler`): model size breakdown,
  per-utterance WER/CER/latency records, summary metrics, plots.

Runs fully offline (random weights + synthetic audio):

    python examples/timestamps_and_profiling.py [--model test2l]
"""

from __future__ import annotations

import argparse
import os

import jax

# honor JAX_PLATFORMS even when a site hook force-registered another
# backend (same guard as cli.py: the env var alone can lose to it, and a
# down TPU tunnel would hang the example)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import tempfile

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="test2l")
    args = ap.parse_args()

    import jax

    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.evaluation.data import synthetic_dataset
    from openai_whisper_compression_tpu.evaluation.longform import transcribe_seek
    from openai_whisper_compression_tpu.evaluation.profiler import (
        ModelProfiler, TranscriptionMetrics, VisualizationUtils,
        WhisperEvaluator, setup_device)
    from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
    from openai_whisper_compression_tpu.models import params as P

    setup_device()

    # a tiny arch with a timestamp-token region carved out of the vocab
    # (the real Whisper vocab has this natively: ids > 50363)
    arch = ARCHS[args.model].replace(
        no_timestamps_token_id=ARCHS[args.model].vocab_size - 100)
    params = P.init_params(arch, jax.random.PRNGKey(0))
    tok = WordTokenizer(arch.vocab_size,
                        special_start=arch.no_timestamps_token_id - 3)

    # 1. timestamp-seek long-form transcription
    g = np.random.default_rng(0)
    window = 2 * arch.max_source_positions * 160  # samples per 30s-equiv
    wav = (g.standard_normal(3 * window) * 0.1).astype(np.float32)
    cfg = DecodeConfig(max_new_tokens=12, language_token_id=None,
                       task_token_id=None, notimestamps=False,
                       max_initial_timestamp_index=20)
    res = transcribe_seek(params, arch, wav, tok, cfg)
    print(f"== long-form: {res['audio_seconds']:.1f}s audio, "
          f"{res['num_windows']} windows, {len(res['segments'])} segments")
    for s in res["segments"][:5]:
        end = "..." if s["end"] is None else f"{s['end']:.2f}"
        print(f"  [{s['start']:6.2f} -> {end:>6}] {s['text'][:48]}")

    # 2. per-sample evaluation + profiling
    with tempfile.TemporaryDirectory() as tmp:
        prof = ModelProfiler(arch.name, results_dir=tmp)
        prof.get_detailed_model_size(params)
        prof.print_size_analysis(top_k=5)

        ev = WhisperEvaluator(params, arch, tok, prof,
                              DecodeConfig(max_new_tokens=6,
                                           language_token_id=None,
                                           task_token_id=None,
                                           notimestamps=False))
        data = synthetic_dataset(4, seed=1, min_dur=1.0, max_dur=2.0)
        records = ev.evaluate_dataset(data)
        summary = TranscriptionMetrics.calculate_summary_metrics(
            records, model_size=prof.measure_model_size(params))
        TranscriptionMetrics.print_summary(summary)
        prof.save_metrics("per_sample.csv")
        VisualizationUtils.plot_error_distributions(records, f"{tmp}/err.png")
        print("== artifacts written to", tmp)


if __name__ == "__main__":
    main()
