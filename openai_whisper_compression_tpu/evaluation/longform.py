"""Long-form transcription via sequential 30 s chunking.

The reference never chunks long audio (LibriSpeech utterances are short; the
processor pad/trims every sample to one 30 s window — SURVEY.md §5). This is
the TPU counterpart for BASELINE.json config 2: split arbitrary-length audio
into 30 s windows, batch the windows through the jitted transcribe fn (one
compile, any audio length), and stitch the texts.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, WhisperArch
from .harness import make_transcribe_fn, samples_for_arch


@functools.lru_cache(maxsize=8)
def _cut_windows_fn(n_rows: int, n_samples: int, int16: bool):
    """Module-level cached window cutter: one compile per (batch, window)
    shape per process. Defining the jit inside transcribe_seek_batch made
    every CALL a fresh jit object — ~10 s of re-trace/compile per call at
    whisper-small shapes, dominating the steady-state wall (the
    fresh-jit-per-call trap from the verify notes, at scale). Unrolled
    contiguous dynamic slices, never vmapped (the gather trap). int16
    pools dequantize in-jit (lossless for PCM16-sourced audio; halves the
    host->device staging upload)."""
    @jax.jit
    def cut(pl, idx, off):
        rows = jnp.concatenate(
            [jax.lax.dynamic_slice(pl, (idx[r], off[r]), (1, n_samples))
             for r in range(n_rows)], axis=0)
        if int16:
            rows = rows.astype(jnp.float32) * (1.0 / 32767.0)
        return rows

    return cut


def chunk_waveform(wav: np.ndarray, n_samples: int,
                   overlap: float = 0.0) -> list[np.ndarray]:
    """Split into fixed windows (optional fractional overlap); the final
    window is zero-padded by the frontend."""
    hop = int(n_samples * (1.0 - overlap)) or n_samples
    chunks = []
    for start in range(0, max(len(wav), 1), hop):
        piece = wav[start: start + n_samples]
        if len(piece) == 0:
            break
        chunks.append(piece)
        if start + n_samples >= len(wav):
            break
    return chunks


SOT_PREV = 50361  # <|startofprev|>


def transcribe_long(params, arch: WhisperArch, wav: np.ndarray, tokenizer,
                    cfg: DecodeConfig | None = None, batch_size: int = 8,
                    transcribe_fn=None, condition_on_previous: bool = False,
                    prompt_window: int = 64,
                    temperatures: tuple[float, ...] | None = None,
                    fallback_kw: dict | None = None,
                    initial_prompt: str | None = None) -> dict:
    """Arbitrary-length waveform -> {"text", "chunks", "audio_seconds"}.

    condition_on_previous=True feeds each chunk the previous chunk's tokens
    as a decoder prompt (OpenAI `condition_on_previous_text`); chunks then
    decode sequentially instead of batched.

    temperatures: enable OpenAI's temperature-fallback ladder per chunk
    batch (see models.fallback) — chunks failing the compression-ratio /
    logprob gates are re-sampled at the next temperature. fallback_kw
    forwards threshold overrides to `decode_with_fallback`.

    initial_prompt: text fed as the first window's decoder prompt (OpenAI
    `initial_prompt`; requires tokenizer.encode). With
    condition_on_previous it seeds the rolling prompt; otherwise only the
    first chunk decodes prompted (matching OpenAI's prompt-reset
    behavior when conditioning is off).
    """
    cfg = cfg or DecodeConfig()
    if condition_on_previous and temperatures is not None:
        raise ValueError("condition_on_previous + temperatures is not "
                         "supported (the prompt-conditioned path has no "
                         "fallback ladder); pick one")
    n_samples = samples_for_arch(arch)
    chunks = chunk_waveform(np.asarray(wav, np.float32), n_samples)

    seed_ids = (list(tokenizer.encode(initial_prompt))
                if initial_prompt else None)
    if condition_on_previous:
        texts = _transcribe_conditioned(params, arch, chunks, tokenizer, cfg,
                                        n_samples, prompt_window,
                                        seed_ids=seed_ids)
    elif seed_ids:
        # first window prompted; the rest ride the batched path unprompted
        texts = _transcribe_conditioned(params, arch, chunks[:1], tokenizer,
                                        cfg, n_samples, prompt_window,
                                        seed_ids=seed_ids)
        if len(chunks) > 1:
            rest = transcribe_long(
                params, arch,
                np.concatenate([np.asarray(c, np.float32)
                                for c in chunks[1:]]),
                tokenizer, cfg=cfg, batch_size=batch_size,
                transcribe_fn=transcribe_fn, temperatures=temperatures,
                fallback_kw=fallback_kw)
            texts = texts + rest["chunks"]
    elif temperatures is not None:
        from ..audio import features
        from ..models.fallback import decode_with_fallback
        from ..models.whisper import encode as _encode

        @jax.jit
        def enc_fn(p, wav_batch):
            mel = features.preprocess(
                wav_batch, n_mels=arch.num_mel_bins,
                length=n_samples).astype(
                jax.tree.leaves(p["encoder"]["ln"])[0].dtype)
            return _encode(p, arch, mel)

        texts = []
        for i in range(0, len(chunks), batch_size):
            batch = chunks[i: i + batch_size]
            buf = np.zeros((batch_size, n_samples), np.float32)
            for j, c in enumerate(batch):
                buf[j, : len(c)] = c
            res = decode_with_fallback(
                params, arch, enc_fn(params, jnp.asarray(buf)),
                decode_text=tokenizer.decode, cfg=cfg,
                temperatures=temperatures, **(fallback_kw or {}))
            texts.extend(res.texts[: len(batch)])
    else:
        if transcribe_fn is None:
            transcribe_fn = make_transcribe_fn(arch, cfg)
        texts = []
        for i in range(0, len(chunks), batch_size):
            batch = chunks[i: i + batch_size]
            buf = np.zeros((batch_size, n_samples), np.float32)
            for j, c in enumerate(batch):
                buf[j, : len(c)] = c
            tokens, lengths = transcribe_fn(params, jnp.asarray(buf))
            tokens, lengths = np.asarray(tokens), np.asarray(lengths)
            for j in range(len(batch)):
                texts.append(tokenizer.decode(tokens[j, : lengths[j]]))
    return {
        "text": " ".join(t for t in texts if t),
        "chunks": texts,
        "audio_seconds": len(wav) / 16000.0,
        "num_chunks": len(chunks),
    }


def segments_from_tokens(arch: WhisperArch,
                         gen: np.ndarray) -> tuple[list[dict], float | None]:
    """Parse a generated token stream (timestamp rules active) into
    segments: [{"start", "end", "tokens", "tok_idx"}] with times in seconds
    relative to the window ("tok_idx" = each text token's position in
    `gen`, for aligning logprob traces).

    Slicing follows OpenAI transcribe() / HF `_retrieve_segment`
    token-for-token (pinned by tests/test_hf_generate_parity.py):

    * "end of segment" = a CONSECUTIVE timestamp pair; the stream is cut
      after the pair's first token.
    * single-timestamp ending ([..., text, ts]) closes the final segment
      at that timestamp but the caller advances a FULL window
      (seek_seconds=None) — the model saw the whole window out.
    * a pair ending seeks to the pair's timestamp (seek_seconds=value).
    * no pair at all: the whole window is ONE segment anchored at the
      window start (start=0.0, not the first timestamp's value — OpenAI
      semantics), ending at the last emitted timestamp when there is one
      (and it isn't <|0.00|>), else end=None (caller uses the window
      duration); full-window advance.

    Divergence from HF (cosmetic): segments whose slice contains no text
    tokens are dropped from the returned list — their boundaries still
    participate in seek arithmetic exactly as in HF."""
    from ..models.decode import timestamp_token_to_seconds as _tts

    ts_begin = arch.no_timestamps_token_id + 1
    toks: list[int] = []
    for t in np.asarray(gen).tolist():
        if int(t) == arch.eos_token_id:
            break
        toks.append(int(t))
    if not toks:
        return [], None
    mask = [t >= ts_begin for t in toks]
    single_ending = len(toks) >= 2 and mask[-2:] == [False, True]
    pairs = [i + 1 for i in range(len(toks) - 1) if mask[i] and mask[i + 1]]

    def _seg(lo: int, hi: int, end_idx: int) -> dict:
        text = [(i, t) for i, t in enumerate(toks[lo:hi], lo) if not mask[i]]
        return {"start": _tts(arch, toks[lo]),
                "end": _tts(arch, toks[end_idx]),
                "tokens": [t for _, t in text],
                "tok_idx": [i for i, _ in text]}

    segments: list[dict] = []
    if pairs:
        slices = list(pairs)
        if single_ending:
            slices.append(len(toks))
        else:
            slices[-1] += 1
        lo = 0
        for n, cur in enumerate(slices):
            is_last = n == len(slices) - 1
            end_idx = cur - 1 if (not is_last or single_ending) else cur - 2
            segments.append(_seg(lo, cur, end_idx))
            lo = cur
        seek = None if single_ending else _tts(arch, toks[lo - 2])
    else:
        text = [(i, t) for i, t in enumerate(toks) if not mask[i]]
        ts_vals = [t for t, m in zip(toks, mask) if m]
        end = (_tts(arch, ts_vals[-1])
               if ts_vals and ts_vals[-1] != ts_begin else None)
        segments = [{"start": 0.0, "end": end,
                     "tokens": [t for _, t in text],
                     "tok_idx": [i for i, _ in text]}]
        seek = None
    return [s for s in segments if s["tokens"]], seek


def _parse_clips(clip_timestamps, total_s: float) -> list[tuple[float, float]]:
    """OpenAI `clip_timestamps`: comma string or list of start,end,... pairs
    in seconds; a missing final end means end-of-audio. Returns merged,
    in-bounds (start, end) pairs; None/""/"0" → the whole file."""
    if clip_timestamps in (None, "", "0", 0):
        return [(0.0, total_s)]
    if isinstance(clip_timestamps, str):
        vals = [float(x) for x in clip_timestamps.split(",") if x.strip()]
    else:
        vals = [float(x) for x in clip_timestamps]
    if not vals:
        return [(0.0, total_s)]
    if len(vals) % 2 == 1:
        vals.append(total_s)
    clips = []
    for i in range(0, len(vals), 2):
        s, e = max(0.0, vals[i]), min(vals[i + 1], total_s)
        if e > s:
            clips.append((s, e))
    if not clips:
        raise ValueError(f"clip_timestamps {clip_timestamps!r} selects no "
                         f"audio (duration {total_s:.2f}s)")
    return clips


def _word_anomaly_score(w: dict) -> float:
    """Per-word hallucination evidence (OpenAI whisper/transcribe.py
    word_anomaly_score): improbable tokens, impossibly short or
    suspiciously long durations."""
    score = 0.0
    if w.get("probability", 1.0) < 0.15:
        score += 1.0
    dur = w["end"] - w["start"]
    if dur < 0.133:
        score += (0.133 - dur) * 15.0
    if dur > 2.0:
        score += dur - 2.0
    return score


def _is_segment_anomaly(seg_words: list[dict] | None) -> bool:
    """Segment looks hallucinated: high total anomaly score over its first
    8 words (OpenAI is_segment_anomaly)."""
    if not seg_words:
        return False
    ws = seg_words[:8]
    score = sum(_word_anomaly_score(w) for w in ws)
    return score >= 3.0 or score + 0.01 >= len(ws)


def _segment_words(seg: dict, words: list[dict]) -> list[dict]:
    """Words whose midpoint falls inside the segment's time span."""
    end = seg["end"] if seg["end"] is not None else float("inf")
    return [w for w in words
            if seg["start"] - 0.1 <= 0.5 * (w["start"] + w["end"]) < end]


def apply_hallucination_rules(segments: list[dict], words: list[dict],
                              t0: float, window_end: float, threshold: float,
                              last_speech_end: float = 0.0
                              ) -> tuple[list[dict], list[dict],
                                         float | None]:
    """Hallucination-silence policy for one decoded window (OpenAI
    `hallucination_silence_threshold`, whisper/transcribe.py): when a
    segment looks hallucinated and is surrounded by silence longer than
    `threshold` seconds, drop it and seek past the silence instead of
    transcribing into it.

    All times absolute seconds. Returns (kept_segments, kept_words,
    seek_override) — seek_override is an absolute time to continue
    decoding from (None = caller's default advance).
    """
    by_seg = [(s, _segment_words(s, words)) for s in segments]
    with_words = [(s, ws) for s, ws in by_seg if ws]

    # 1. leading silence before a hallucinated first segment: skip the
    #    silence and re-decode from the first word.
    if with_words:
        first_seg, first_ws = with_words[0]
        gap = first_ws[0]["start"] - t0
        if _is_segment_anomaly(first_ws) and gap > threshold:
            return [], [], first_ws[0]["start"]

    # 2. a hallucinated segment surrounded by silence: drop it (and
    #    everything after) and seek just past its start.
    hal_last_end = last_speech_end
    for i, (seg, ws) in enumerate(with_words):
        if _is_segment_anomaly(ws):
            nxt = with_words[i + 1] if i + 1 < len(with_words) else None
            next_start = nxt[1][0]["start"] if nxt else window_end
            silence_before = (seg["start"] - hal_last_end > threshold
                              or seg["start"] < threshold
                              or seg["start"] - t0 < 2.0)
            silence_after = (next_start - (seg["end"] or window_end)
                             > threshold
                             or (nxt is not None
                                 and _is_segment_anomaly(nxt[1]))
                             or window_end - (seg["end"] or window_end) < 2.0)
            if silence_before and silence_after:
                seek = max(t0 + 1.0, seg["start"])
                if (seg["end"] is not None
                        and window_end - seg["end"] < threshold):
                    seek = window_end  # hallucination at content end: skip
                cut = seg["start"]
                kept_s = [s for s, _ in by_seg if s["start"] < cut
                          and s is not seg]
                kept_w = [w for w in words
                          if 0.5 * (w["start"] + w["end"]) < cut]
                return kept_s, kept_w, seek
        hal_last_end = seg["end"] if seg["end"] is not None else hal_last_end

    # 3. long trailing silence after the last word: continue from the last
    #    word instead of the window end (don't hand silence to the next
    #    window's decoder).
    if words:
        last_word_end = max(w["end"] for w in words)
        if window_end - last_word_end > threshold:
            return segments, words, last_word_end
    return segments, words, None


def _align_window_words(params, arch: WhisperArch, enc_row, win_toks,
                        tokenizer, alignment_heads, piece_len: int,
                        t0: float, token_logprobs=None) -> list[dict]:
    """Word timestamps for one decoded window (shared by transcribe_seek
    and transcribe_seek_batch): cross-attention DTW alignment + word
    grouping, times offset to absolute `t0` seconds."""
    from ..models import alignment as align_mod

    n_frames = max(1, min(arch.max_source_positions, piece_len // 320))
    times = align_mod.find_alignment(params, arch, enc_row, win_toks,
                                     alignment_heads=alignment_heads,
                                     n_frames=n_frames)
    ts_begin = arch.no_timestamps_token_id + 1
    special = min(arch.eos_token_id, arch.decoder_start_token_id, ts_begin)
    return align_mod.word_timestamps(
        tokenizer, np.asarray(win_toks).tolist(), times,
        special_threshold=special, offset=t0, token_logprobs=token_logprobs)


_NSP_FNS: dict = {}
_ENC_FNS: dict = {}
_COND_FNS: dict = {}


def _enc_fn(arch: WhisperArch):
    """Cached jitted wav -> encoder-output fn. transcribe_seek evaluates a
    corpus one file at a time; a fresh jax.jit closure per call would
    re-trace (and, without the persistent compile cache, recompile) the
    full encoder once per FILE — the same retrace bug _FN_CACHE fixes for
    the per-window ladder fns (models/fallback.py)."""
    fn = _ENC_FNS.get(arch)
    if fn is None:
        from ..audio import features as _feats
        from ..models.whisper import encode as _encode

        n_samples = samples_for_arch(arch)

        @jax.jit
        def fn(p, w):
            mel = _feats.preprocess(w, arch.num_mel_bins, length=n_samples)
            return _encode(p, arch, mel.astype(jnp.float32))

        _ENC_FNS[arch] = fn
    return fn


def _cond_fn(arch: WhisperArch, cfg):
    """Cached jitted conditioned decode step (prompted greedy/beam over a
    30 s window), keyed by (arch, cfg) like fallback._ladder_fns — one
    trace per configuration instead of one per transcribed file. Distinct
    prompt widths recompile via jit's own shape cache, as they must."""
    import dataclasses

    try:
        key = (arch, dataclasses.astuple(cfg))
    except TypeError:           # unhashable cfg field: skip caching
        key = None
    if key is not None and key in _COND_FNS:
        return _COND_FNS[key]
    from ..audio import features as _feats
    from ..models.decode import beam_decode, greedy_decode
    from ..models.whisper import encode as _encode

    n_samples = samples_for_arch(arch)
    cond_lp = cfg.beam_size <= 1

    @jax.jit
    def fn(p, w, prompt, plen):
        mel = _feats.preprocess(w, arch.num_mel_bins, length=n_samples)
        e = _encode(p, arch, mel.astype(jnp.float32))
        if cond_lp:
            return greedy_decode(p, arch, e, cfg, prompt_tokens=prompt,
                                 prompt_lens=plen,
                                 return_token_logprobs=True)
        return beam_decode(p, arch, e, cfg, prompt_tokens=prompt,
                           prompt_lens=plen)

    if key is not None:
        _COND_FNS[key] = fn
    return fn


def _nsp_fn(arch: WhisperArch):
    """Cached jitted P(<|nospeech|>) evaluator (one tiny decoder step on a
    cached encoder output — negligible next to the window decode). Keyed
    by the arch VALUE, not its name: `.replace()` variants share a name
    but bake different token ids into the closure."""
    fn = _NSP_FNS.get(arch)
    if fn is None:
        from ..models.decode import no_speech_prob

        fn = jax.jit(lambda p, e: no_speech_prob(p, arch, e))
        _NSP_FNS[arch] = fn
    return fn


def _segment_with_meta(seg: dict, t0: float, text: str,
                       token_lps_row, first_gen: int,
                       no_speech: float | None) -> dict:
    """One output segment with OpenAI's per-segment metadata: avg_logprob
    (mean greedy token logprob over the segment's text tokens; None for
    beam/injected-fn decodes with no trace), compression_ratio (zlib on
    the text — the repetition-loop signal), no_speech_prob (the window's
    P(<|nospeech|>); None when the encoder output wasn't at hand).
    Mirrors OpenAI whisper transcribe()'s segment dicts."""
    from ..models.fallback import compression_ratio

    avg_lp = None
    if token_lps_row is not None and seg.get("tok_idx"):
        avg_lp = float(np.mean(
            [token_lps_row[first_gen + j] for j in seg["tok_idx"]]))
    return {
        "start": t0 + seg["start"],
        "end": None if seg["end"] is None else t0 + seg["end"],
        "text": text,
        "tokens": [int(t) for t in seg["tokens"]],
        "avg_logprob": avg_lp,
        "compression_ratio": compression_ratio(text),
        "no_speech_prob": no_speech,
        "temperature": 0.0,   # overridden by the seek fallback ladder
    }


def transcribe_seek(params, arch: WhisperArch, wav: np.ndarray, tokenizer,
                    cfg: DecodeConfig | None = None,
                    transcribe_fn=None,
                    word_timestamps: bool = False,
                    alignment_heads=None,
                    clip_timestamps=None,
                    hallucination_silence_threshold: float | None = None,
                    temperatures: tuple[float, ...] | None = None,
                    fallback_kw: dict | None = None,
                    condition_on_previous: bool = False,
                    prompt_window: int = 64,
                    initial_prompt_ids: list | None = None) -> dict:
    """Timestamp-seeking long-form transcription (OpenAI transcribe()
    semantics): decode a 30 s window with timestamp rules, advance to the
    end of the last complete segment, repeat. Falls back to full-window
    advance when no closing timestamp was emitted.

    word_timestamps=True additionally aligns each window's tokens to audio
    frames via cross-attention DTW (models/alignment.py, ≈ OpenAI
    `word_timestamps=True`) and returns a "words" list with absolute times.

    clip_timestamps (OpenAI parity): "start,end,start,end,..." seconds (or
    a list of floats); only those ranges are transcribed, segment/word
    times stay absolute. A missing final end = end of audio.

    hallucination_silence_threshold (OpenAI parity; needs word_timestamps):
    when a decoded segment looks hallucinated (improbable/ill-timed words,
    `_is_segment_anomaly`) and is surrounded by more than this many seconds
    of silence, it is dropped and decoding seeks past the silence
    (`apply_hallucination_rules`). Word "probability" comes from the greedy
    per-token logprob trace (models.decode return_token_logprobs).

    condition_on_previous (OpenAI `condition_on_previous_text`, its
    transcribe() default): each window's decoder is prompted with the
    rolling tail of previously emitted tokens (`<|startofprev|>` window,
    `prompt_window` wide), seeded by `initial_prompt_ids`. One fixed-shape
    jitted step serves every window (same discipline as streaming.py).
    Mutually exclusive with temperatures / word_timestamps / an injected
    transcribe_fn (the prompt-capable step has no fallback or DTW path).

    temperatures (OpenAI parity — whisper's transcribe() runs its
    temperature-fallback ladder per WINDOW inside the seek loop): windows
    failing the compression-ratio/logprob gates retry at the next rung;
    each segment carries the window's accepted "temperature" and the
    window-level avg_logprob (OpenAI stamps the decode-result average
    onto every segment of the window). Incompatible with
    hallucination_silence_threshold (which needs the greedy per-token
    trace that sampling retries don't produce) and with an injected
    transcribe_fn. fallback_kw forwards gate thresholds / best_of.

    Returns {"text", "segments" (absolute times), "num_windows"[, "words"]}."""
    from ..models.decode import _timestamps_enabled, forced_prefix

    cfg = cfg or DecodeConfig(notimestamps=False)
    if not _timestamps_enabled(arch, cfg):
        raise ValueError("transcribe_seek requires timestamp decoding "
                         "(notimestamps=False and a vocab with timestamp "
                         "tokens); use transcribe_long otherwise")
    hst = hallucination_silence_threshold
    if hst is not None and not word_timestamps:
        raise ValueError("hallucination_silence_threshold requires "
                         "word_timestamps=True (OpenAI semantics)")
    if temperatures is not None:
        if hst is not None:
            raise ValueError("temperatures + hallucination_silence_"
                             "threshold: the fallback ladder has no "
                             "greedy per-token trace to score words")
        if transcribe_fn is not None:
            raise ValueError("temperatures needs its own decode path; "
                             "do not inject transcribe_fn")
        if cfg.beam_size > 1:
            raise ValueError("temperatures + beam_size > 1: the fallback "
                             "ladder decodes greedy/sampling only")
    conditioned = condition_on_previous or bool(initial_prompt_ids)
    if conditioned and (temperatures is not None or word_timestamps
                        or transcribe_fn is not None):
        raise ValueError("condition_on_previous/initial_prompt in seek "
                         "mode is mutually exclusive with temperatures, "
                         "word_timestamps and an injected transcribe_fn")
    n_samples = samples_for_arch(arch)
    # greedy decodes always carry the logprob trace now: it feeds the
    # per-segment avg_logprob metadata, not just hallucination scoring
    want_lp = (hst is not None) or cfg.beam_size <= 1
    own_fn = transcribe_fn is None
    use_fallback = temperatures is not None
    if own_fn and not use_fallback:
        # our own fn can also hand back the encoder output, saving the
        # alignment path a second full encoder pass per window
        transcribe_fn = make_transcribe_fn(arch, cfg,
                                           token_logprobs=want_lp,
                                           return_enc=word_timestamps)
    fn_returns_enc = own_fn and word_timestamps and not use_fallback
    first_gen = len(forced_prefix(arch, cfg))

    fb_enc_fn = _enc_fn(arch) if use_fallback else None

    pw = 0
    cond_step = None
    history: list[int] = [int(t) for t in (initial_prompt_ids or [])]
    if conditioned:
        # prompt shares the decoder position budget with the forced
        # prefix and generation (same clamp as streaming.py)
        max_pw = (arch.max_target_positions - first_gen
                  - cfg.max_new_tokens - 1)
        pw = max(min(int(prompt_window), max_pw), 0)
        if pw < 2:
            pw, conditioned = 0, False
    if conditioned:
        cond_step = _cond_fn(arch, cfg)

    enc_fn = None
    if word_timestamps and not fn_returns_enc:
        enc_fn = _enc_fn(arch)

    wav = np.asarray(wav, np.float32)
    clips = _parse_clips(clip_timestamps, len(wav) / 16000.0)
    windows = 0
    all_segments: list[dict] = []
    all_words: list[dict] = []
    last_speech_end = 0.0
    for clip_start, clip_end in clips:
        pos = int(clip_start * 16000)
        clip_end_sample = min(int(clip_end * 16000), len(wav))
        while pos < clip_end_sample:
            buf = np.zeros((1, n_samples), np.float32)
            piece = wav[pos: min(pos + n_samples, clip_end_sample)]
            buf[0, : len(piece)] = piece
            jb = jnp.asarray(buf)
            token_lps = None
            enc = nsp = win_avg_lp = None
            win_temp = 0.0
            fg = first_gen
            if conditioned:
                if history:
                    prompt, plen = _seed_prompt(history, pw,
                                                arch.eos_token_id,
                                                arch.vocab_size)
                else:
                    # no context yet (or after an initial_prompt-only
                    # reset): plen=0, NOT a dangling lone <|startofprev|>
                    # (same guard as streaming.py's _decode_inputs)
                    prompt = np.full((1, pw), arch.eos_token_id, np.int32)
                    plen = np.zeros((1,), np.int32)
                outs = cond_step(params, jb, jnp.asarray(prompt),
                                 jnp.asarray(plen))
                tokens, lengths = np.asarray(outs[0]), np.asarray(outs[1])
                if len(outs) > 2:
                    token_lps = np.asarray(outs[2])
                fg = pw + first_gen
            elif use_fallback:
                from ..models.fallback import decode_with_fallback

                enc = fb_enc_fn(params, jb)
                fres = decode_with_fallback(
                    params, arch, enc, decode_text=tokenizer.decode,
                    cfg=cfg, temperatures=temperatures,
                    **(fallback_kw or {}))
                tokens, lengths = fres.tokens, fres.lengths
                win_temp = float(fres.temperatures[0])
                win_avg_lp = float(fres.avg_logprobs[0])
            else:
                outs = transcribe_fn(params, jb)
                tokens, lengths = np.asarray(outs[0]), np.asarray(outs[1])
                # output layout: (tokens, lengths[, lp_trace][, enc]) — the
                # flags are known for our own fn; an injected fn may append
                # a logprob trace only
                idx = 2
                if (want_lp or (not own_fn and len(outs) > idx)):
                    if len(outs) > idx:
                        token_lps = np.asarray(outs[idx])
                        idx += 1
            gen = tokens[0, fg: lengths[0]]
            segments, seek_s = segments_from_tokens(arch, gen)
            t0 = pos / 16000.0
            if word_timestamps:
                if enc is None:
                    enc = (outs[idx] if fn_returns_enc
                           else enc_fn(params, jb))
                nsp = float(np.asarray(_nsp_fn(arch)(params, enc))[0])
            lp_row = None if token_lps is None else token_lps[0]
            win_segments = [
                _segment_with_meta(s, t0, tokenizer.decode(s["tokens"]),
                                   lp_row, fg, nsp)
                for s in segments]
            for seg in win_segments:
                # OpenAI stamps the window decode-result's accepted
                # temperature (and, under fallback, its whole-window
                # avg_logprob) onto every segment of the window
                seg["temperature"] = win_temp
                if win_avg_lp is not None:
                    seg["avg_logprob"] = win_avg_lp
            if conditioned:
                if condition_on_previous:
                    # OpenAI appends all generated tokens to the rolling
                    # prompt context; keep a bounded tail
                    history.extend(int(t) for t in gen.tolist()
                                   if int(t) != arch.eos_token_id)
                    history = history[-4 * pw:]
                else:
                    # initial_prompt alone prompts only the FIRST window
                    # (OpenAI's prompt-reset when conditioning is off)
                    history = []
            win_words: list[dict] = []
            if word_timestamps:
                win_words = _align_window_words(
                    params, arch, enc, tokens[0, : lengths[0]], tokenizer,
                    alignment_heads, len(piece), t0,
                    token_logprobs=(None if token_lps is None
                                    else token_lps[0, : lengths[0]]))
            windows += 1
            seek_override = None
            if hst is not None:
                window_end = t0 + len(piece) / 16000.0
                win_segments, win_words, seek_override = (
                    apply_hallucination_rules(win_segments, win_words, t0,
                                              window_end, hst,
                                              last_speech_end))
            all_segments.extend(win_segments)
            all_words.extend(win_words)
            if win_words:
                last_speech_end = max(w["end"] for w in win_words)
            if seek_override is not None:
                # skip detected silence/hallucination; min 0.1 s progress
                pos = max(int(seek_override * 16000), pos + 1600)
                continue
            advance = (n_samples if seek_s is None else int(seek_s * 16000))
            pos += max(advance, 1)  # never stall
            if len(piece) < n_samples:
                break  # final (padded) window consumed the clip
    out = {
        "text": " ".join(s["text"] for s in all_segments if s["text"]),
        "segments": [dict(s, id=i) for i, s in enumerate(all_segments)],
        "num_windows": windows,
        "audio_seconds": len(wav) / 16000.0,
    }
    if word_timestamps:
        out["words"] = all_words
    return out


def transcribe_seek_batch(params, arch: WhisperArch, wavs, tokenizer,
                          cfg: DecodeConfig | None = None,
                          batch_size: int = 8,
                          transcribe_fn=None,
                          word_timestamps: bool = False,
                          alignment_heads=None,
                          stage_int16: bool = False) -> list[dict]:
    """Multi-stream timestamp-seek transcription.

    OpenAI's seek loop is inherently sequential PER FILE (each window's
    seek position depends on the previous window's timestamps), but
    nothing couples different files — so the TPU-first schedule is to
    multiplex windows from many streams into ONE fixed-batch compiled
    window decoder and keep the MXU saturated: each iteration gathers the
    next window of up to `batch_size` unfinished streams, decodes them in
    one call, and advances every stream's seek independently. Idle slots
    are zero-padded (shape-static program, one compile).

    The stream audio is STAGED ON-DEVICE once up front (one padded
    (N, max_len + window) pool) and each iteration's window batch is cut
    by a jitted per-row `dynamic_slice` — the host sends only the seek
    offsets. Before this, every iteration re-built and re-uploaded the
    full (B, 30 s) f32 window batch from the host (~61 MB at B=32), which
    dominated the wall through a tunnelled backend (VERDICT r4 #7:
    window_rtfx 282 vs a ~1400-RTFx headline). The pool is right-padded
    by one window of zeros so end-of-stream slices zero-pad instead of
    clamping.

    Per-stream results match `transcribe_seek` (each batch row is
    independent under the batched model). Word timestamps are supported
    (batched encoder pass + per-row DTW); for
    `hallucination_silence_threshold` use the single-stream API.

    Returns a list of result dicts, one per input waveform, in order.
    """
    from ..models.decode import _timestamps_enabled, forced_prefix

    cfg = cfg or DecodeConfig(notimestamps=False)
    if not _timestamps_enabled(arch, cfg):
        raise ValueError("transcribe_seek_batch requires timestamp decoding "
                         "(notimestamps=False and a vocab with timestamp "
                         "tokens)")
    n_samples = samples_for_arch(arch)
    own_fn = transcribe_fn is None
    own_lp = own_fn and cfg.beam_size <= 1   # greedy trace -> avg_logprob
    if own_fn:
        transcribe_fn = make_transcribe_fn(arch, cfg,
                                           token_logprobs=own_lp,
                                           return_enc=word_timestamps)
    fn_returns_enc = own_fn and word_timestamps
    first_gen = len(forced_prefix(arch, cfg))

    enc_fn = None
    if word_timestamps and not fn_returns_enc:
        from ..audio import features
        from ..models.whisper import encode

        @jax.jit
        def enc_fn(p, w):
            mel = features.preprocess(w, arch.num_mel_bins,
                                      length=n_samples)
            return encode(p, arch, mel.astype(jnp.float32))

    wavs = [np.asarray(w, np.float32) for w in wavs]
    n = len(wavs)
    pos = [0] * n
    done = [len(w) == 0 for w in wavs]
    segs: list[list[dict]] = [[] for _ in range(n)]
    words: list[list[dict]] = [[] for _ in range(n)]
    win_count = [0] * n

    # one-time device staging + jitted window cut (host sends offsets
    # only). stage_int16 stores the pool as PCM16 (2 B/sample; bit-exact
    # for 16-bit-PCM-sourced audio like LibriSpeech) and dequantizes
    # inside the cut program — halves the staging upload.
    max_len = max((len(w) for w in wavs), default=0)
    stage_dt = np.int16 if stage_int16 else np.float32
    pool = np.zeros((n, max_len + n_samples), stage_dt)
    for i, w in enumerate(wavs):
        if stage_int16:
            pool[i, : len(w)] = np.clip(w * 32767.0, -32768,
                                        32767).astype(np.int16)
        else:
            pool[i, : len(w)] = w
    jpool = jnp.asarray(pool)
    cut_windows = _cut_windows_fn(batch_size, n_samples, stage_int16)

    while not all(done):
        rows = [s for s in range(n) if not done[s]][:batch_size]
        idx = np.zeros((batch_size,), np.int32)
        off = np.zeros((batch_size,), np.int32)
        piece_len = {}
        for r, s in enumerate(rows):
            idx[r] = s
            off[r] = pos[s]
            piece_len[s] = min(len(wavs[s]) - pos[s], n_samples)
        jbuf = cut_windows(jpool, jnp.asarray(idx), jnp.asarray(off))
        outs = transcribe_fn(params, jbuf)   # (tokens, lengths[, lp][, enc])
        tokens, lengths = np.asarray(outs[0]), np.asarray(outs[1])
        token_lps = np.asarray(outs[2]) if own_lp else None
        if fn_returns_enc:
            enc = outs[-1]                   # encoder output reused for DTW
        else:
            enc = enc_fn(params, jbuf) if word_timestamps else None
        nsp_rows = (np.asarray(_nsp_fn(arch)(params, enc))
                    if word_timestamps else None)
        for r, s in enumerate(rows):
            gen = tokens[r, first_gen: lengths[r]]
            window_segs, seek_s = segments_from_tokens(arch, gen)
            t0 = pos[s] / 16000.0
            nsp = None if nsp_rows is None else float(nsp_rows[r])
            lp_row = None if token_lps is None else token_lps[r]
            for seg in window_segs:
                segs[s].append(_segment_with_meta(
                    seg, t0, tokenizer.decode(seg["tokens"]),
                    lp_row, first_gen, nsp))
            if word_timestamps:
                words[s].extend(_align_window_words(
                    params, arch, enc[r: r + 1], tokens[r, : lengths[r]],
                    tokenizer, alignment_heads, piece_len[s], t0))
            win_count[s] += 1
            advance = (n_samples if seek_s is None else int(seek_s * 16000))
            pos[s] += max(advance, 1)
            if piece_len[s] < n_samples or pos[s] >= len(wavs[s]):
                done[s] = True

    out = []
    for s in range(n):
        res = {
            "text": " ".join(x["text"] for x in segs[s] if x["text"]),
            "segments": [dict(x, id=i) for i, x in enumerate(segs[s])],
            "num_windows": win_count[s],
            "audio_seconds": len(wavs[s]) / 16000.0,
        }
        if word_timestamps:
            res["words"] = words[s]
        out.append(res)
    return out


def _seed_prompt(ids: list, pw: int, eot: int,
                 vocab: int) -> tuple[np.ndarray, np.ndarray]:
    """Right-aligned (1, pw) prompt window [<|startofprev|>] + trailing ids
    (OpenAI keeps the last n_ctx//2-1 prompt tokens; here the window is
    pw)."""
    ids = [int(t) for t in ids if 0 <= int(t) < vocab]
    ids = list(ids[-(pw - 1):]) if pw > 1 else []
    if SOT_PREV < vocab:
        ids = [SOT_PREV] + ids
    ids = ids[-pw:]
    prompt = np.full((1, pw), eot, np.int32)
    if ids:
        prompt[0, pw - len(ids):] = ids
    return prompt, np.asarray([len(ids)], np.int32)


def _transcribe_conditioned(params, arch: WhisperArch, chunks, tokenizer,
                            cfg: DecodeConfig, n_samples: int,
                            pw: int, seed_ids: list | None = None
                            ) -> list[str]:
    from ..audio import features
    from ..models.decode import beam_decode, forced_prefix
    from ..models.whisper import encode

    p_len = len(forced_prefix(arch, cfg))
    first_gen = pw + p_len
    eot = arch.eos_token_id

    @jax.jit
    def step(params, wav, prompt, plen):
        mel = features.preprocess(wav, arch.num_mel_bins,
                                  length=n_samples).astype(jnp.float32)
        enc = encode(params, arch, mel)
        # beam_decode falls back to greedy at beam_size<=1; both support
        # prompt conditioning + timestamp rules
        return beam_decode(params, arch, enc, cfg,
                           prompt_tokens=prompt, prompt_lens=plen)

    texts: list[str] = []
    if seed_ids:
        # OpenAI initial_prompt: tokens precede the first window's prefix
        prompt, plen = _seed_prompt(seed_ids, pw, eot, arch.vocab_size)
    else:
        prompt = np.full((1, pw), eot, np.int32)
        plen = np.zeros((1,), np.int32)
    for chunk in chunks:
        buf = np.zeros((1, n_samples), np.float32)
        buf[0, : len(chunk)] = chunk
        tokens, lengths = step(params, jnp.asarray(buf), jnp.asarray(prompt),
                               jnp.asarray(plen))
        tokens, lengths = np.asarray(tokens), np.asarray(lengths)
        gen = tokens[0, first_gen: lengths[0]]
        gen = gen[gen != eot]
        texts.append(tokenizer.decode(gen))
        # next prompt: <|startofprev|> + trailing generated tokens
        prompt, plen = _seed_prompt(list(gen), pw, eot, arch.vocab_size)
    return texts
