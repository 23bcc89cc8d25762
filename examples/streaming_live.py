"""Live streaming transcription walkthrough.

Shows the incremental-decoding surfaces (beyond the reference, which is
offline-only):
- `streaming.StreamingTranscriber`: feed audio as it arrives, read back
  monotonic committed text + a live pending tail (LocalAgreement-n);
- energy-VAD gating: silent stretches cost zero TPU decodes;
- `streaming.StreamingPool`: N concurrent sessions share ONE batched
  compiled decode — the serving-scale configuration.

Runs fully offline (random weights + synthetic audio):

    python examples/streaming_live.py [--model test2l-ts]
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

import numpy as np

from openai_whisper_compression_tpu import load_model
from openai_whisper_compression_tpu.config import DecodeConfig
from openai_whisper_compression_tpu.evaluation.harness import samples_for_arch
from openai_whisper_compression_tpu.evaluation.tokenizer import default_tokenizer
from openai_whisper_compression_tpu.streaming import (StreamingPool,
                                                      StreamingTranscriber)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="test2l-ts",
                    help="arch name (needs timestamp tokens)")
    ap.add_argument("--seconds", type=float, default=3.0)
    args = ap.parse_args()

    params, arch = load_model(args.model)
    tok = default_tokenizer(arch)
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None, notimestamps=False,
                       max_initial_timestamp_index=20)
    n = samples_for_arch(arch)
    g = np.random.default_rng(0)
    wav = (g.standard_normal(int(args.seconds * 16000)) * 0.1
           ).astype(np.float32)
    wav[: 16000 // 2] = 0.0                       # leading silence

    print("== single stream (VAD on) ==")
    st = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.5,
                              vad_threshold=1e-3)
    chunk = max(n // 4, 1600)
    for i in range(0, len(wav), chunk):
        out = st.feed(wav[i: i + chunk])
        print(f"  t={min((i + chunk), len(wav)) / 16000.0:5.2f}s  "
              f"committed={out['committed']!r}  pending={out['pending']!r}")
    final = st.flush()
    print(f"  final: {final['committed']!r} "
          f"({len(final['segments'])} segments)")

    print("== pooled streams (one batched decode per tick) ==")
    pool = StreamingPool(params, arch, tok, cfg, max_streams=4,
                         min_step_s=0.5)
    for sid in ("mic-1", "mic-2"):
        pool.open(sid)
    for i in range(0, len(wav), chunk):
        pool.feed("mic-1", wav[i: i + chunk])
        pool.feed("mic-2", wav[len(wav) - i - chunk: len(wav) - i])
        partials = pool.tick()
        line = "  ".join(f"{sid}: {p['committed']!r}"
                         for sid, p in sorted(partials.items()))
        print(f"  tick {i // chunk}: {line}")
    for sid in ("mic-1", "mic-2"):
        print(f"  {sid} final: {pool.close(sid)['committed']!r}")


if __name__ == "__main__":
    main()
