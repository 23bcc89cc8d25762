"""WER/CER metrics and text normalization.

Self-contained replacement for the reference's HF `evaluate` WER/CER metrics
(`evaluation.py:109-117`) and its two normalizers (tokenizer `normalize=True`
at `data_utils.py:60,170`; lowercase/strip-punct at
`openai_whisper_compression/utils.py:148-160`). Edit distance is a vectorized
numpy DP, not a Python-loop stand-in.
"""

from __future__ import annotations

import re
import string

import numpy as np


def normalize_text(text: str) -> str:
    """Basic English normalizer: lowercase, strip punctuation, collapse
    whitespace (the notebook stack's recipe,
    `openai_whisper_compression/utils.py:148-160`)."""
    text = text.lower()
    text = re.sub(rf"[{re.escape(string.punctuation)}]", " ", text)
    return " ".join(text.split())


def edit_distance(ref: list, hyp: list) -> int:
    """Levenshtein distance with a rolling-row numpy DP (O(len_ref) memory,
    inner loop vectorized over the hypothesis axis)."""
    n, m = len(ref), len(hyp)
    if n == 0:
        return m
    if m == 0:
        return n
    hyp_arr = np.asarray(hyp, dtype=object)
    idx = np.arange(m + 1, dtype=np.int64)
    prev = idx.copy()
    for i in range(1, n + 1):
        sub = prev[:-1] + (hyp_arr != ref[i - 1])
        ins = prev[1:] + 1
        best = np.minimum(sub, ins)
        # cur[j] = min(best[j], cur[j-1]+1) unrolled via prefix-min:
        # cur[j] = min_{k<=j}(ext[k] + (j-k)) with ext = [i, best...]
        ext = np.concatenate(([i], best))
        prev = np.minimum.accumulate(ext - idx) + idx
    return int(prev[-1])


def wer(references: list[str], hypotheses: list[str],
        normalize: bool = True) -> float:
    """Corpus-level word error rate (total edits / total reference words)."""
    edits = words = 0
    for ref, hyp in zip(references, hypotheses, strict=True):
        if normalize:
            ref, hyp = normalize_text(ref), normalize_text(hyp)
        r, h = ref.split(), hyp.split()
        edits += edit_distance(r, h)
        words += len(r)
    return edits / max(words, 1)


def cer(references: list[str], hypotheses: list[str],
        normalize: bool = True) -> float:
    """Corpus-level character error rate."""
    edits = chars = 0
    for ref, hyp in zip(references, hypotheses, strict=True):
        if normalize:
            ref, hyp = normalize_text(ref), normalize_text(hyp)
        edits += edit_distance(list(ref), list(hyp))
        chars += len(ref)
    return edits / max(chars, 1)


def per_sample_wer(reference: str, hypothesis: str,
                   normalize: bool = True) -> float:
    return wer([reference], [hypothesis], normalize)
