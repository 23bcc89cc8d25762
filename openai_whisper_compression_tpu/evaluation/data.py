"""Dataset pipeline: LibriSpeech streaming loader + synthetic fallback.

Mirrors the reference's canonical data layer (`data_utils.py`):
`load_librispeech(num_samples, split)` (:8-41), per-sample feature mapping
(:44-61) and `prepare_datasets` calibration/test splitting (:64-116). Because
TPU pods often run with no egress, a deterministic synthetic dataset with the
same record schema ({audio, text, duration}) backs tests and offline runs.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

import numpy as np

from ..config import SAMPLE_RATE


@dataclass
class Utterance:
    audio: np.ndarray       # float32 waveform @ 16 kHz
    text: str               # reference transcript
    duration: float         # seconds
    uid: str = ""


def load_librispeech(num_samples: int | None = None,
                     split: str = "test.clean") -> list[Utterance]:
    """Streaming LibriSpeech loader (HF datasets), same semantics as reference
    `data_utils.py:8-41`. Raises RuntimeError when the hub is unreachable."""
    try:
        from datasets import load_dataset

        # split names are verbatim HF librispeech_asr splits ("test.clean",
        # "test.other"), exactly as the reference passes them
        stream = load_dataset("librispeech_asr", split=split, streaming=True,
                              trust_remote_code=True)
        if num_samples:
            stream = stream.take(num_samples)
        out = []
        for rec in stream:
            wav = np.asarray(rec["audio"]["array"], np.float32)
            out.append(Utterance(
                audio=wav, text=rec["text"],
                duration=len(wav) / rec["audio"]["sampling_rate"],
                uid=str(rec.get("id", len(out)))))
        return out
    except Exception as e:  # no network / no cache
        raise RuntimeError(
            f"LibriSpeech unavailable ({e}); use synthetic_dataset() offline"
        ) from e


def synthetic_dataset(num_samples: int = 16, seed: int = 0,
                      vocab_size: int = 500, min_words: int = 3,
                      max_words: int = 12,
                      min_dur: float = 2.0, max_dur: float = 10.0) -> list[Utterance]:
    """Deterministic synthetic utterances with the LibriSpeech record schema.

    Audio is a word-keyed tone sequence plus noise; transcripts come from the
    WordTokenizer vocabulary ("w17 w384 ..."), so the full pipeline
    (features → model → decode → WER) runs end-to-end offline.
    """
    rng = np.random.default_rng(seed)
    out = []
    for i in range(num_samples):
        n_words = int(rng.integers(min_words, max_words + 1))
        words = rng.integers(0, vocab_size, n_words)
        dur = float(rng.uniform(min_dur, max_dur))
        n = int(dur * SAMPLE_RATE)
        t = np.arange(n) / SAMPLE_RATE
        wav = 0.01 * rng.standard_normal(n).astype(np.float32)
        seg = n // max(n_words, 1)
        for j, w in enumerate(words):
            f = 80.0 + (w % 64) * 50.0  # word-keyed tone
            sl = slice(j * seg, (j + 1) * seg)
            wav[sl] += (0.3 * np.sin(2 * np.pi * f * t[sl])).astype(np.float32)
        uid = hashlib.md5(f"{seed}:{i}".encode()).hexdigest()[:8]
        out.append(Utterance(audio=wav, duration=dur, uid=uid,
                             text=" ".join(f"w{int(w)}" for w in words)))
    return out


def prepare_datasets(num_cal: int = 8, num_test: int = 16, seed: int = 0,
                     use_librispeech: bool = False) -> dict[str, list[Utterance]]:
    """Calibration/test splits for clean+other, matching the reference's
    4-way dict (`data_utils.py:64-116`)."""
    if use_librispeech:
        clean = load_librispeech(num_cal + num_test, "test.clean")
        other = load_librispeech(num_cal + num_test, "test.other")
    else:
        clean = synthetic_dataset(num_cal + num_test, seed=seed)
        other = synthetic_dataset(num_cal + num_test, seed=seed + 1)
    return {
        "calibration_clean": clean[:num_cal],
        "test_clean": clean[num_cal:],
        "calibration_other": other[:num_cal],
        "test_other": other[num_cal:],
    }


def batch_iterator(dataset: list[Utterance],
                   batch_size: int) -> Iterator[list[Utterance]]:
    for i in range(0, len(dataset), batch_size):
        yield dataset[i: i + batch_size]
