"""Metrics, memory tracker, and end-to-end eval-harness tests."""

import json

import numpy as np
import pytest

from openai_whisper_compression_tpu.evaluation import metrics


# ---------------------------------------------------------------------------
# WER / CER
# ---------------------------------------------------------------------------

def test_edit_distance_known_cases():
    assert metrics.edit_distance(list("kitten"), list("sitting")) == 3
    assert metrics.edit_distance([], list("ab")) == 2
    assert metrics.edit_distance(list("abc"), []) == 3
    assert metrics.edit_distance(list("abc"), list("abc")) == 0
    assert metrics.edit_distance("a man a plan".split(), "a plan".split()) == 2


def test_edit_distance_random_vs_naive(rng):
    def naive(r, h):
        n, m = len(r), len(h)
        d = np.zeros((n + 1, m + 1), int)
        d[:, 0] = np.arange(n + 1)
        d[0, :] = np.arange(m + 1)
        for i in range(1, n + 1):
            for j in range(1, m + 1):
                d[i, j] = min(d[i - 1, j - 1] + (r[i - 1] != h[j - 1]),
                              d[i - 1, j] + 1, d[i, j - 1] + 1)
        return d[n, m]

    for _ in range(25):
        r = list(rng.integers(0, 5, rng.integers(0, 12)))
        h = list(rng.integers(0, 5, rng.integers(0, 12)))
        assert metrics.edit_distance(r, h) == naive(r, h)


def test_wer_cer():
    refs = ["the cat sat on the mat", "hello world"]
    hyps = ["the cat sat on mat", "hello word"]
    # 1 deletion / 6 words + 1 sub / 2 words = 2/8
    assert metrics.wer(refs, hyps) == pytest.approx(2 / 8)
    assert 0 < metrics.cer(refs, hyps) < 0.2
    assert metrics.wer(refs, refs) == 0.0


def test_normalize():
    assert metrics.normalize_text("Hello, World!  ") == "hello world"
    assert metrics.wer(["Hello!"], ["hello"]) == 0.0


def test_whisper_normalizer():
    """Full OpenAI-style normalizer (reference scoring at
    data_utils.py:60,170): contractions expand, spelled numbers/currency
    become digits, brackets drop — all differences the basic normalizer
    cannot erase."""
    n = metrics.whisper_normalizer()
    assert n("It's one hundred and twenty-three dollars! [laughs]") \
        == "it is $123"
    assert n("Mr. Smith won't go") == "mister smith will not go"
    # WER 0 under whisper normalization, nonzero under basic
    refs = ["It's twenty-two dollars"]
    hyps = ["it is $22"]
    assert metrics.wer(refs, hyps, normalizer=n) == 0.0
    assert metrics.wer(refs, hyps) > 0.0
    # same instance cached; non-English falls to the basic variant
    assert metrics.whisper_normalizer() is n
    nb = metrics.whisper_normalizer(language="de")
    assert nb("Füße!") == "füße "


def test_resolve_normalizer():
    assert metrics.resolve_normalizer(None) is metrics.normalize_text
    assert metrics.resolve_normalizer("basic") is metrics.normalize_text
    assert metrics.resolve_normalizer("whisper") \
        is metrics.whisper_normalizer()
    assert metrics.resolve_normalizer("none") is None
    with pytest.raises(ValueError, match="unknown normalizer"):
        metrics.resolve_normalizer("bogus")


def test_harness_normalizer_selection():
    """EvalConfig.normalizer reaches the scoring: 'none' makes case matter,
    'whisper'/'basic' do not (and the choice lands in the artifact)."""
    from openai_whisper_compression_tpu.cli import _normalizer_for

    class A:  # argparse namespace stand-in
        normalizer = None
        librispeech = False
        hf = None

    assert _normalizer_for(A()) == "basic"
    a = A(); a.librispeech = True
    assert _normalizer_for(a) == "whisper"
    a = A(); a.audio_dir = "/data"
    assert _normalizer_for(a) == "whisper"
    # --hf alone changes the weights, not the data: synthetic token refs
    # must keep basic scoring
    a = A(); a.hf = "openai/whisper-tiny"
    assert _normalizer_for(a) == "basic"
    a = A(); a.librispeech = True; a.normalizer = "none"
    assert _normalizer_for(a) == "none"


# ---------------------------------------------------------------------------
# Memory tracker
# ---------------------------------------------------------------------------

def test_memory_tracker(tmp_path):
    from openai_whisper_compression_tpu.evaluation.memory import MemoryTracker

    t = MemoryTracker("m", save_path=str(tmp_path / "mem.json"))
    for i in range(3):
        t.log_memory(split="clean", batch_idx=i, batch_size=4,
                     audio_duration=10.0, latency=0.5)
    s = t.get_memory_summary()
    assert s["num_samples"] == 3
    assert s["rss_mb"]["mean"] > 0
    t.close()
    saved = json.loads((tmp_path / "mem.json").read_text())
    assert len(saved["samples"]) == 3


# ---------------------------------------------------------------------------
# End-to-end harness on synthetic data + tiny random model
# ---------------------------------------------------------------------------

def test_evaluate_model_end_to_end(tmp_path):
    import jax

    from openai_whisper_compression_tpu.config import (ARCHS, DecodeConfig,
                                                       EvalConfig)
    from openai_whisper_compression_tpu.evaluation import harness
    from openai_whisper_compression_tpu.evaluation.data import synthetic_dataset
    from openai_whisper_compression_tpu.evaluation.memory import MemoryTracker
    from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
    from openai_whisper_compression_tpu.models import params as P

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    data = synthetic_dataset(6, seed=1, vocab_size=500,
                             min_dur=0.5, max_dur=1.2)
    tok = WordTokenizer(arch.vocab_size, special_start=997)
    tracker = MemoryTracker("test2l")

    scores, records = harness.evaluate_model(
        params, arch, data, tok,
        eval_cfg=EvalConfig(batch_size=4, num_samples=6, warmup_batches=1),
        decode_cfg=DecodeConfig(max_new_tokens=6, language_token_id=None,
                                task_token_id=None, notimestamps=False),
        memory_tracker=tracker,
    )
    assert scores["num_samples"] == 6
    assert scores["wer"] is not None and scores["wer"] > 0  # random weights
    assert scores["rtfx"] > 0
    assert len(records) == 6
    assert scores["memory"]["num_samples"] == 2  # 2 batches logged

    paths = harness.save_evaluation_results(scores, records, "test2l",
                                            str(tmp_path))
    saved = json.loads(open(paths["metrics"]).read())
    assert saved["metrics"]["num_samples"] == 6

    out = harness.print_evaluation_summary({"test2l": scores})
    assert "WER" in out


def test_length_bucketing_preserves_results():
    """length_bucketing batches by duration but must not change scores or
    the ORDER of returned records (VERDICT r2 next-step #2)."""
    import jax

    from openai_whisper_compression_tpu.config import (ARCHS, DecodeConfig,
                                                       EvalConfig)
    from openai_whisper_compression_tpu.evaluation import harness
    from openai_whisper_compression_tpu.evaluation.data import (
        synthetic_dataset)
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        WordTokenizer)
    from openai_whisper_compression_tpu.models import params as P

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    # deliberately shuffled durations: min 0.5 s to max 6 s
    data = synthetic_dataset(8, seed=5, vocab_size=500,
                             min_dur=0.5, max_dur=6.0)
    assert [u.duration for u in data] != sorted(u.duration for u in data)
    tok = WordTokenizer(arch.vocab_size, special_start=997)
    dcfg = DecodeConfig(max_new_tokens=6, language_token_id=None,
                        task_token_id=None, notimestamps=False)

    s_plain, r_plain = harness.evaluate_model(
        params, arch, data, tok,
        eval_cfg=EvalConfig(batch_size=4, warmup_batches=0,
                            length_bucketing=False), decode_cfg=dcfg)
    s_bucket, r_bucket = harness.evaluate_model(
        params, arch, data, tok,
        eval_cfg=EvalConfig(batch_size=4, warmup_batches=0,
                            length_bucketing=True), decode_cfg=dcfg)
    assert [r["id"] for r in r_bucket] == [u.uid for u in data]
    assert [r["id"] for r in r_plain] == [r["id"] for r in r_bucket]
    # per-utterance hypotheses identical (batch composition must not
    # change a row's transcription: rows are independent)
    for a, b in zip(r_plain, r_bucket):
        assert a["hypothesis"] == b["hypothesis"]
    assert s_plain["wer"] == s_bucket["wer"]


def test_synthetic_dataset_deterministic():
    from openai_whisper_compression_tpu.evaluation.data import (
        prepare_datasets, synthetic_dataset)

    a = synthetic_dataset(4, seed=3)
    b = synthetic_dataset(4, seed=3)
    assert a[0].text == b[0].text
    np.testing.assert_array_equal(a[0].audio, b[0].audio)
    splits = prepare_datasets(num_cal=2, num_test=3)
    assert {len(v) for v in splits.values()} == {2, 3}
    assert set(splits) == {"calibration_clean", "test_clean",
                           "calibration_other", "test_other"}
