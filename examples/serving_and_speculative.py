"""Serving + speculative decoding walkthrough.

Shows the two serving-grade surfaces:
- `serving.TranscriptionService`: dynamic batching in front of ONE compiled
  transcribe program (pad-to-batch, native threaded loader, occupancy/RTFx
  stats);
- `models.speculative`: a draft model proposes tokens, the target verifies
  them in one windowed pass — output is bit-exact vs target-only greedy;
- word-level timestamps via cross-attention DTW alignment.

Runs fully offline (random weights + synthetic audio):

    python examples/serving_and_speculative.py [--model test2l]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="test2l")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu import load_model
    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.evaluation.harness import (
        make_speculative_transcribe_fn, make_transcribe_fn, samples_for_arch)
    from openai_whisper_compression_tpu.evaluation.tokenizer import default_tokenizer
    from openai_whisper_compression_tpu.models import alignment
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.models.whisper import encode
    from openai_whisper_compression_tpu.serving import TranscriptionService

    params, arch = load_model(args.model)
    tok = default_tokenizer(arch)
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None)
    rng = np.random.default_rng(0)
    n = samples_for_arch(arch)

    # ---- 1. dynamic-batching service
    print("== TranscriptionService (dynamic batching) ==")
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=4,
                               max_wait_ms=25)
    futs = [svc.submit(rng.standard_normal(int(n * f)).astype(np.float32) * 0.1)
            for f in (0.3, 0.6, 1.0)]
    for i, f in enumerate(futs):
        r = f.result(timeout=300)
        print(f"  req{i}: {r['audio_seconds']:.1f}s audio -> "
              f"{len(r['tokens'])} tokens, latency {r['latency_s']*1e3:.0f} ms")
    svc.close()
    print("  stats:", {k: round(v, 3) if isinstance(v, float) else v
                       for k, v in svc.stats.snapshot().items()})

    # ---- 2. speculative decoding (draft = 1-layer shrink of the target)
    print("== Speculative decoding ==")
    arch_d = arch.replace(name="draft", encoder_layers=1, decoder_layers=1)
    params_d = P.init_params(arch_d, jax.random.PRNGKey(7))
    wav = jnp.asarray(rng.standard_normal((2, n)) * 0.1, jnp.float32)
    tg, lg = make_transcribe_fn(arch, cfg)(params, wav)
    ts, lsp = make_speculative_transcribe_fn(arch, arch_d, cfg, gamma=3)(
        params, params_d, wav)
    m = int(np.asarray(lg).min())
    exact = np.array_equal(np.asarray(tg)[:, :m], np.asarray(ts)[:, :m])
    print(f"  speculative == greedy: {exact}")

    # ---- 3. word-level timestamps (cross-attention DTW)
    print("== Word-level timestamps ==")
    enc = jax.jit(lambda p, w: encode(
        p, arch, jnp.zeros((1, arch.num_mel_bins,
                            2 * arch.max_source_positions), jnp.float32)))(
        params, None)
    toks = np.asarray(tg)[0, : int(np.asarray(lg)[0])]
    times = alignment.find_alignment(params, arch, enc, toks)
    words = alignment.word_timestamps(
        tok, toks.tolist(), times,
        special_threshold=min(arch.eos_token_id, arch.decoder_start_token_id))
    for w in words[:5]:
        print(f"  {w['start']:5.2f}-{w['end']:5.2f}  {w['word']}")

    # ---- 4. temperature-fallback decoding (OpenAI quality gates)
    print("== Temperature fallback ==")
    from openai_whisper_compression_tpu.models.fallback import (
        decode_with_fallback)

    res = decode_with_fallback(
        params, arch, enc, decode_text=tok.decode, cfg=cfg,
        temperatures=(0.0, 0.2, 0.4), no_speech_threshold=0.9)
    for i in range(min(2, len(res.texts))):
        print(f"  T={res.temperatures[i]:.1f} lp={res.avg_logprobs[i]:.2f} "
              f"cr={res.compression_ratios[i]:.2f} "
              f"silent={bool(res.is_silent[i])}")
    print("done.")


if __name__ == "__main__":
    main()
