"""Word-level timestamps via cross-attention DTW alignment.

OpenAI Whisper's `word_timestamps=True` (whisper/timing.py find_alignment):
re-run the decoder teacher-forced over the generated tokens, collect
cross-attention probabilities from the alignment heads, and dynamic-time-warp
the (token × audio-frame) attention matrix into a monotonic token→time map.
The reference never exposes timestamps at all (its HF `generate` call at
`data_utils.py:152` returns text only) — this is capability beyond parity,
included because segment/word timing is core Whisper surface.

TPU split: attention-weight extraction is a jitted teacher-forced pass
(matmul-shaped, one call per utterance); the DTW itself is a tiny
O(tokens × frames) host-side numpy dynamic program (OpenAI runs it on CPU
too — whisper/timing.py backtrace).
"""

from __future__ import annotations

import functools
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperArch
from .whisper import (NEG_INF, _num_heads, embed_tokens, layer_norm, linear,
                      merge_heads, mlp, precompute_cross_kv,
                      read_cross_kv, self_attention, split_heads)

Params = dict[str, Any]

FRAME_SECONDS = 0.02  # one encoder frame = 2 mel hops = 20 ms


def _cross_attention_probs(p: Params, x: jax.Array, kv, head_dim: int
                           ) -> tuple[jax.Array, jax.Array]:
    """Cross-attention returning (output, probs (B, H, L, S))."""
    h = _num_heads(p, head_dim)
    k, v = read_cross_kv(kv, x.dtype)
    q = split_heads(linear(x, p["q"]["w"], p["q"].get("b")), h)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q * (head_dim ** -0.5), k,
                        preferred_element_type=jnp.float32)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
    o = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(q.dtype), v,
                   preferred_element_type=jnp.float32).astype(q.dtype)
    out = linear(merge_heads(o), p["o"]["w"], p["o"].get("b"))
    return out, probs


def cross_attention_weights(params: Params, arch: WhisperArch,
                            tokens: jax.Array, enc_out: jax.Array
                            ) -> jax.Array:
    """Teacher-forced decoder pass returning stacked cross-attention
    probabilities (L_layers, B, H, L_tokens, S)."""
    dec = params["decoder"]
    b, l = tokens.shape
    x = embed_tokens(dec, tokens.reshape(-1)).reshape(b, l, -1)
    x = x + dec["pos"][:l].astype(x.dtype)
    causal = jnp.triu(jnp.full((l, l), NEG_INF, jnp.float32), k=1)[None, None]
    cross_kvs = precompute_cross_kv(params, arch, enc_out)
    all_probs = []
    for layer, kv in zip(dec["layers"], cross_kvs):
        x = x + self_attention(layer["attn"], layer_norm(x, layer["attn_ln"]),
                               arch.head_dim, mask=causal)
        o, probs = _cross_attention_probs(
            layer["cross"], layer_norm(x, layer["cross_ln"]), kv,
            arch.head_dim)
        x = x + o
        x = x + mlp(layer, layer_norm(x, layer["mlp_ln"]))
        all_probs.append(probs)
    return jnp.stack(all_probs)


def default_alignment_heads(arch: WhisperArch) -> list[tuple[int, int]]:
    """(layer, head) pairs to align with. OpenAI ships a per-checkpoint mask;
    absent one, use all heads of the top half of the decoder (OpenAI's
    fallback for fine-tuned checkpoints, whisper/__init__.py)."""
    lo = arch.decoder_layers // 2
    return [(li, h) for li in range(lo, arch.decoder_layers)
            for h in range(arch.decoder_heads)]


def _median_filter(x: np.ndarray, width: int = 7) -> np.ndarray:
    """Median filter along the last axis (same-size, edge-padded)."""
    if width <= 1:
        return x
    pad = width // 2
    xp = np.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="edge")
    win = np.stack([xp[..., i:i + x.shape[-1]] for i in range(width)], axis=-1)
    return np.median(win, axis=-1)


def dtw_path(cost: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Monotonic DTW through cost (N_tokens, M_frames); returns the
    (token_idx, frame_idx) backtraced path (OpenAI whisper/timing.py dtw)."""
    n, m = cost.shape
    big = np.inf
    acc = np.full((n + 1, m + 1), big, np.float64)
    trace = np.zeros((n + 1, m + 1), np.int8)
    acc[0, 0] = 0.0
    for i in range(1, n + 1):
        row_prev = acc[i - 1]
        row = acc[i]
        for j in range(1, m + 1):
            c0 = row_prev[j - 1]   # match (diag)
            c1 = row_prev[j]       # insertion (advance token)
            c2 = row[j - 1]        # deletion (advance frame)
            best = min(c0, c1, c2)
            row[j] = cost[i - 1, j - 1] + best
            trace[i, j] = 0 if best == c0 else (1 if best == c1 else 2)
    i, j = n, m
    path_i, path_j = [], []
    while i > 0 or j > 0:
        path_i.append(i - 1)
        path_j.append(j - 1)
        if i > 0 and j > 0:
            t = trace[i, j]
        elif i > 0:
            t = 1
        else:
            t = 2
        if t == 0:
            i, j = i - 1, j - 1
        elif t == 1:
            i -= 1
        else:
            j -= 1
    return np.asarray(path_i[::-1]), np.asarray(path_j[::-1])


def find_alignment(params: Params, arch: WhisperArch, enc_out: jax.Array,
                   tokens: np.ndarray,
                   alignment_heads: Sequence[tuple[int, int]] | None = None,
                   medfilt_width: int = 7,
                   n_frames: int | None = None) -> np.ndarray:
    """Token→time alignment for ONE utterance.

    tokens: (L,) full decoder input (prefix + generated, no trailing pad).
    n_frames: valid encoder frames (defaults to all; pass the true audio
    length in frames to exclude padding from alignment).

    Returns (L, 2) float32 [start, end] seconds per token.
    """
    tokens = np.asarray(tokens, np.int32)
    heads = (alignment_heads or list(arch.alignment_heads)
             or default_alignment_heads(arch))
    w = np.asarray(_weights_jit(params, arch, jnp.asarray(tokens[None]),
                                enc_out))               # (L_layers,1,H,L,S)
    mats = np.stack([w[li, 0, h] for li, h in heads])    # (A, L, S)
    if n_frames is not None:
        mats = mats[..., :n_frames]

    # standardize per head over time, smooth, average heads (OpenAI recipe)
    mean = mats.mean(-2, keepdims=True)
    std = mats.std(-2, keepdims=True) + 1e-8
    mats = (mats - mean) / std
    mats = _median_filter(mats, medfilt_width)
    matrix = mats.mean(0)                                # (L, S)

    ti, fi = dtw_path(-matrix.astype(np.float64))
    # token boundaries: frames where the token index advances
    starts = np.zeros(len(tokens), np.float32)
    ends = np.zeros(len(tokens), np.float32)
    jump = np.flatnonzero(np.diff(ti, prepend=-1))       # first path idx per token
    start_frames = fi[jump]
    end_frames = np.append(start_frames[1:], fi[-1] + 1)
    starts[: len(start_frames)] = start_frames * FRAME_SECONDS
    ends[: len(end_frames)] = end_frames * FRAME_SECONDS
    return np.stack([starts, ends], axis=-1)


@functools.partial(jax.jit, static_argnames=("arch",))
def _weights_jit(params, arch, tokens, enc_out):
    return cross_attention_weights(params, arch, tokens, enc_out)


PREPEND_PUNCTUATIONS = "\"'\u201c\u00bf([{-"
APPEND_PUNCTUATIONS = "\"'.\u3002,\uff0c!\uff01?\uff1f:\uff1a\u201d)]}\u3001"


def merge_punctuations(words: list[dict],
                       prepended: str = PREPEND_PUNCTUATIONS,
                       appended: str = APPEND_PUNCTUATIONS) -> list[dict]:
    """Attach punctuation-only words to their neighbours.

    OpenAI-parity post-pass (whisper/timing.py merge_punctuations role): a
    word made entirely of opening punctuation ("¿ ( [ quote …) is glued onto
    the FOLLOWING word (its start time wins); one made of closing
    punctuation (. , ! ? quote …) is glued onto the PRECEDING word (end
    time extends). Operates on [{"word","start","end"}] and returns a new
    list; input order is preserved.
    """
    merged: list[dict] = []
    pending_prefix: dict | None = None
    for w in words:
        text = w["word"]
        if text and all(c in prepended for c in text):
            # accumulate consecutive opening punctuation
            if pending_prefix is None:
                pending_prefix = dict(w)
            else:
                pending_prefix["word"] += text
            continue
        if pending_prefix is not None:
            # main word's extra keys (e.g. "probability") survive the merge
            w = {**w, "word": pending_prefix["word"] + text,
                 "start": pending_prefix["start"]}
            pending_prefix = None
        if (merged and text
                and all(c in appended for c in text)):
            merged[-1] = {**merged[-1], "word": merged[-1]["word"] + text,
                          "end": w["end"]}
            continue
        merged.append(dict(w))
    if pending_prefix is not None:  # trailing orphan opener: keep as-is
        merged.append(pending_prefix)
    return merged


def word_timestamps(tokenizer, tokens: Sequence[int],
                    token_times: np.ndarray,
                    special_threshold: int | None = None,
                    offset: float = 0.0,
                    punctuations: bool = True,
                    token_logprobs: np.ndarray | None = None) -> list[dict]:
    """Group per-token times into words.

    A token starting a new word is one whose decoded text begins with a
    space (or the first text token). Special tokens (id >= threshold) are
    skipped; when `special_threshold` is None it defaults to the
    tokenizer's `special_start` (WordTokenizer) or 50257 (the EOT id, start
    of the special range in every real Whisper vocab). With
    `punctuations=True` (default) punctuation-only words are merged onto
    their neighbours via `merge_punctuations` (OpenAI prepend/append
    punctuation semantics). `token_logprobs` (len(tokens),) adds a
    "probability" key per word: exp(mean logprob of its tokens) — OpenAI
    word-probability semantics (whisper/timing.py).

    Returns [{"word", "start", "end"[, "probability"]}] with times offset
    by `offset` s.
    """
    if special_threshold is None:
        special_threshold = getattr(tokenizer, "special_start", 50257)
    lps = (None if token_logprobs is None
           else np.asarray(token_logprobs, np.float64))
    words: list[dict] = []
    cur = ""
    cur_start = cur_end = None
    cur_lp_sum, cur_lp_n = 0.0, 0

    def _flush():
        w = {"word": cur.strip(), "start": float(cur_start + offset),
             "end": float(cur_end + offset)}
        if lps is not None:
            w["probability"] = float(np.exp(cur_lp_sum / max(cur_lp_n, 1)))
        words.append(w)

    for i, (tok, (t0, t1)) in enumerate(zip(tokens,
                                            np.asarray(token_times))):
        if tok >= special_threshold:
            continue
        piece = tokenizer.decode([int(tok)])
        if not piece:
            continue
        if piece.startswith(" ") and cur.strip():
            _flush()
            cur = ""
            cur_start = None
            cur_lp_sum, cur_lp_n = 0.0, 0
        if cur_start is None:
            cur_start = t0
        cur += piece
        cur_end = t1
        if lps is not None:
            cur_lp_sum += float(lps[i])
            cur_lp_n += 1
    if cur.strip():
        _flush()
    return merge_punctuations(words) if punctuations else words
