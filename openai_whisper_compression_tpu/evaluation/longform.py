"""Long-form transcription via sequential 30 s chunking.

The reference never chunks long audio (LibriSpeech utterances are short; the
processor pad/trims every sample to one 30 s window — SURVEY.md §5). This is
the TPU counterpart for BASELINE.json config 2: split arbitrary-length audio
into 30 s windows, batch the windows through the jitted transcribe fn (one
compile, any audio length), and stitch the texts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DecodeConfig, WhisperArch
from .harness import make_transcribe_fn, samples_for_arch


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
    segments: [{"start", "end", "tokens"}] with times in seconds relative to
    the window. Returns (segments, seek_seconds) where seek_seconds is the
    end of the last COMPLETE segment (None when the stream has no closing
    timestamp — caller then advances a full window). Mirrors OpenAI
    whisper's transcribe() seek logic."""
    from ..models.decode import timestamp_token_to_seconds

    ts_begin = arch.no_timestamps_token_id + 1
    segments: list[dict] = []
    start_tok: int | None = None
    text: list[int] = []
    last_end: float | None = None
    for t in np.asarray(gen).tolist():
        if t == arch.eos_token_id:
            break
        if t >= ts_begin:
            if start_tok is None:
                start_tok = t
            elif text:  # closing timestamp of a segment
                segments.append({
                    "start": timestamp_token_to_seconds(arch, start_tok),
                    "end": timestamp_token_to_seconds(arch, t),
                    "tokens": text,
                })
                last_end = segments[-1]["end"]
                start_tok = None
                text = []
            else:  # consecutive timestamps: pause; restart the segment
                start_tok = t
        elif start_tok is not None:
            text.append(t)
    if text and start_tok is not None:
        # trailing unterminated segment: keep the text, no seek anchor
        segments.append({
            "start": timestamp_token_to_seconds(arch, start_tok),
            "end": None, "tokens": text,
        })
    return segments, last_end


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


def transcribe_seek(params, arch: WhisperArch, wav: np.ndarray, tokenizer,
                    cfg: DecodeConfig | None = None,
                    transcribe_fn=None,
                    word_timestamps: bool = False,
                    alignment_heads=None,
                    clip_timestamps=None) -> dict:
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

    Returns {"text", "segments" (absolute times), "num_windows"[, "words"]}."""
    from ..models.decode import _timestamps_enabled, forced_prefix

    cfg = cfg or DecodeConfig(notimestamps=False)
    if not _timestamps_enabled(arch, cfg):
        raise ValueError("transcribe_seek requires timestamp decoding "
                         "(notimestamps=False and a vocab with timestamp "
                         "tokens); use transcribe_long otherwise")
    n_samples = samples_for_arch(arch)
    if transcribe_fn is None:
        transcribe_fn = make_transcribe_fn(arch, cfg)
    first_gen = len(forced_prefix(arch, cfg))

    enc_fn = None
    if word_timestamps:
        from ..audio import features
        from ..models import alignment as align_mod
        from ..models.whisper import encode

        @jax.jit
        def enc_fn(p, w):
            mel = features.preprocess(w, arch.num_mel_bins,
                                      length=n_samples)
            return encode(p, arch, mel.astype(jnp.float32))

    wav = np.asarray(wav, np.float32)
    clips = _parse_clips(clip_timestamps, len(wav) / 16000.0)
    windows = 0
    all_segments: list[dict] = []
    all_words: list[dict] = []
    for clip_start, clip_end in clips:
        pos = int(clip_start * 16000)
        clip_end_sample = min(int(clip_end * 16000), len(wav))
        while pos < clip_end_sample:
            buf = np.zeros((1, n_samples), np.float32)
            piece = wav[pos: min(pos + n_samples, clip_end_sample)]
            buf[0, : len(piece)] = piece
            tokens, lengths = transcribe_fn(params, jnp.asarray(buf))
            tokens, lengths = np.asarray(tokens), np.asarray(lengths)
            gen = tokens[0, first_gen: lengths[0]]
            segments, seek_s = segments_from_tokens(arch, gen)
            t0 = pos / 16000.0
            for s in segments:
                all_segments.append({
                    "start": t0 + s["start"],
                    "end": None if s["end"] is None else t0 + s["end"],
                    "text": tokenizer.decode(s["tokens"]),
                })
            if word_timestamps:
                enc = enc_fn(params, jnp.asarray(buf))
                win_toks = tokens[0, : lengths[0]]
                n_frames = max(1, min(arch.max_source_positions,
                                      len(piece) // 320))
                times = align_mod.find_alignment(
                    params, arch, enc, win_toks,
                    alignment_heads=alignment_heads, n_frames=n_frames)
                ts_begin = arch.no_timestamps_token_id + 1
                special = min(arch.eos_token_id, arch.decoder_start_token_id,
                              ts_begin)
                all_words.extend(align_mod.word_timestamps(
                    tokenizer, win_toks.tolist(), times,
                    special_threshold=special, offset=t0))
            windows += 1
            advance = (int(seek_s * 16000) if seek_s else n_samples)
            pos += max(advance, 1)  # never stall
            if len(piece) < n_samples:
                break  # final (padded) window consumed the clip
    out = {
        "text": " ".join(s["text"] for s in all_segments if s["text"]),
        "segments": all_segments,
        "num_windows": windows,
        "audio_seconds": len(wav) / 16000.0,
    }
    if word_timestamps:
        out["words"] = all_words
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
