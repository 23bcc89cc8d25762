"""Temperature-fallback decoding with OpenAI's quality gates.

OpenAI's `whisper.transcribe` decodes each segment at temperature 0 and
retries at (0.2, 0.4, 0.6, 0.8, 1.0) when the result fails either gate:
gzip compression ratio > 2.4 (degenerate repetition) or mean token logprob
< -1.0 (low confidence); a no-speech probability above threshold marks the
segment silent (whisper/transcribe.py `decode_with_fallback`). The
reference inherits HF `generate` greedy defaults and has no fallback at
all — repetition loops reach its WER numbers unfiltered.

TPU shape: `temperature` is a traced scalar and sampling runs inside the
jitted `greedy_decode` while-loop, so the whole ladder reuses ONE compiled
program; each retry re-decodes only the still-failing rows' worth of work
(the batch is re-submitted whole — shapes stay static — but accepted rows
keep their first passing result).
"""

from __future__ import annotations

import dataclasses
import zlib
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, WhisperArch
from .params import Params
from .decode import forced_prefix, greedy_decode, no_speech_prob

DEFAULT_TEMPERATURES = (0.0, 0.2, 0.4, 0.6, 0.8, 1.0)

# jitted ladder fns cached per (arch, cfg): decode_with_fallback is called
# once per WINDOW by the seek loop — a fresh jax.jit lambda per call would
# retrace/recompile the full decoder every 30 s window
_FN_CACHE: dict = {}


def _ladder_fns(arch: WhisperArch, cfg: DecodeConfig):
    try:
        key = (arch, dataclasses.astuple(cfg))
    except TypeError:           # unhashable cfg field: skip caching
        key = None
    if key is not None and key in _FN_CACHE:
        return _FN_CACHE[key]
    fn = jax.jit(lambda p, e, k, t: greedy_decode(
        p, arch, e, cfg, sample_key=k, temperature=t,
        return_logprobs=True))
    nsp = jax.jit(lambda p, e: no_speech_prob(p, arch, e))
    if key is not None:
        _FN_CACHE[key] = (fn, nsp)
    return fn, nsp


def compression_ratio(text: str) -> float:
    """len(utf8) / len(zlib(utf8)) — > ~2.4 flags looped/repeated output
    (OpenAI whisper/utils.py compression_ratio)."""
    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


@dataclasses.dataclass
class FallbackResult:
    tokens: np.ndarray          # (B, L) accepted tokens per sequence
    lengths: np.ndarray         # (B,)
    avg_logprobs: np.ndarray    # (B,) mean generated-token logprob
    temperatures: np.ndarray    # (B,) temperature that produced each row
    compression_ratios: np.ndarray  # (B,)
    no_speech_probs: np.ndarray | None  # (B,) if gated
    is_silent: np.ndarray       # (B,) no-speech gate verdict
    texts: list[str]


def needs_fallback(avg_logprob: float, ratio: float,
                   compression_ratio_threshold: float | None = 2.4,
                   logprob_threshold: float | None = -1.0) -> bool:
    """True when either OpenAI gate trips (None disables a gate)."""
    if (compression_ratio_threshold is not None
            and ratio > compression_ratio_threshold):
        return True
    if logprob_threshold is not None and avg_logprob < logprob_threshold:
        return True
    return False


def decode_with_fallback(params: Params, arch: WhisperArch,
                         enc_out: jax.Array,
                         decode_text: Callable[[list[int]], str],
                         cfg: DecodeConfig | None = None,
                         temperatures: tuple[float, ...] = DEFAULT_TEMPERATURES,
                         compression_ratio_threshold: float | None = 2.4,
                         logprob_threshold: float | None = -1.0,
                         no_speech_threshold: float | None = None,
                         seed: int = 0, best_of: int = 1) -> FallbackResult:
    """Decode `enc_out` through the temperature ladder until every sequence
    passes both quality gates (or temperatures run out — then the last
    attempt is kept, like OpenAI).

    decode_text: token ids (generated slice, EOT stripped) -> text used by
    the compression-ratio gate (pass the tokenizer's `.decode`).
    no_speech_threshold: if set, sequences with
    P(<|nospeech|>) > threshold AND avg_logprob < logprob_threshold are
    flagged silent in `is_silent` (their tokens are still returned).
    best_of: at temperature > 0, sample this many independent candidates
    per sequence (OpenAI DecodingOptions.best_of) and keep the highest
    mean-logprob one. Rides batch expansion — the (B*best_of) rows decode
    in ONE call (categorical sampling inside the while_loop folds the key
    per step and draws per row, so replicas diverge); t=0 stays a single
    deterministic decode. Two compiled programs total (B and B*best_of).
    """
    cfg = cfg or DecodeConfig()
    if cfg.beam_size > 1:
        # fail loudly: the ladder decodes greedy (t=0) / sampling (t>0) —
        # silently ignoring a requested beam search would return different
        # transcripts than the caller's decode config specifies
        raise ValueError("decode_with_fallback is greedy/sampling only; "
                         "beam_size > 1 is not supported on the "
                         "temperature ladder")
    b = enc_out.shape[0]
    eot = arch.eos_token_id
    p_len = len(forced_prefix(arch, cfg))  # gates run on generated text only

    fn, nsp_fn = _ladder_fns(arch, cfg)

    def attempt(key, temp):
        """One ladder rung -> (tokens, lengths, logprobs) host arrays,
        best-of-reduced per original sequence when sampling."""
        n_cand = best_of if (temp > 0 and best_of > 1) else 1
        enc = (jnp.repeat(enc_out, n_cand, axis=0) if n_cand > 1
               else enc_out)
        toks, lens, lps = fn(params, enc, key,
                             jnp.asarray(temp, jnp.float32))
        toks, lens = np.asarray(toks), np.asarray(lens)
        lps = np.asarray(lps, np.float32)
        if n_cand > 1:
            sel = lps.reshape(b, n_cand).argmax(axis=1)
            idx = np.arange(b) * n_cand + sel
            toks, lens, lps = toks[idx], lens[idx], lps[idx]
        return toks, lens, lps

    best: dict[str, np.ndarray | None] = {
        "tokens": None, "lengths": None, "lp": None, "temp": None,
        "ratio": None}
    pending = np.ones((b,), bool)
    for ti, temp in enumerate(temperatures):
        key = jax.random.fold_in(jax.random.PRNGKey(seed), ti)
        toks, lens, lps = attempt(key, temp)
        ratios = np.zeros((b,), np.float32)
        fails = np.zeros((b,), bool)
        for i in range(b):
            if not pending[i]:
                continue
            gen = [int(t) for t in toks[i, p_len: lens[i]] if int(t) != eot]
            ratios[i] = compression_ratio(decode_text(gen))
            fails[i] = needs_fallback(float(lps[i]), float(ratios[i]),
                                      compression_ratio_threshold,
                                      logprob_threshold)
        if best["tokens"] is None:
            best = {"tokens": toks, "lengths": lens, "lp": lps,
                    "temp": np.full((b,), temp, np.float32),
                    "ratio": ratios}
        else:
            # adopt this attempt for rows that were still pending
            take = pending
            for k, v in (("tokens", toks), ("lengths", lens), ("lp", lps),
                         ("ratio", ratios)):
                best[k] = np.where(
                    take.reshape((-1,) + (1,) * (v.ndim - 1)), v, best[k])
            best["temp"] = np.where(take, temp, best["temp"])
        pending = pending & fails
        if not pending.any():
            break

    nsp = None
    silent = np.zeros((b,), bool)
    if no_speech_threshold is not None:
        nsp = np.asarray(nsp_fn(params, enc_out), np.float32)
        silent = nsp > no_speech_threshold
        if logprob_threshold is not None:
            # OpenAI: low confidence confirms the silence verdict
            silent = silent & (best["lp"] < logprob_threshold)

    texts = []
    for i in range(b):
        gen = [int(t) for t in best["tokens"][i, p_len: best["lengths"][i]]
               if int(t) != eot]
        texts.append("" if silent[i] else decode_text(gen))
    return FallbackResult(
        tokens=best["tokens"], lengths=best["lengths"],
        avg_logprobs=best["lp"], temperatures=best["temp"],
        compression_ratios=best["ratio"], no_speech_probs=nsp,
        is_silent=silent, texts=texts)
