"""Long-form transcription via sequential 30 s chunking.

The reference never chunks long audio (LibriSpeech utterances are short; the
processor pad/trims every sample to one 30 s window — SURVEY.md §5). This is
the TPU counterpart for BASELINE.json config 2: split arbitrary-length audio
into 30 s windows, batch the windows through the jitted transcribe fn (one
compile, any audio length), and stitch the texts.
"""

from __future__ import annotations

from typing import Sequence

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


def transcribe_long(params, arch: WhisperArch, wav: np.ndarray, tokenizer,
                    cfg: DecodeConfig | None = None, batch_size: int = 8,
                    transcribe_fn=None) -> dict:
    """Arbitrary-length waveform -> {"text", "chunks", "audio_seconds"}."""
    cfg = cfg or DecodeConfig()
    n_samples = samples_for_arch(arch)
    if transcribe_fn is None:
        transcribe_fn = make_transcribe_fn(arch, cfg)
    chunks = chunk_waveform(np.asarray(wav, np.float32), n_samples)

    texts: list[str] = []
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
