"""End-to-end walkthrough: load → analyze → prune → quantize → verify
fidelity → store compressed → reload → transcribe.

Runs fully offline (random weights + synthetic audio). With a hub/cache
available, swap `load_model("small")` for
`load_model(hf="openai/whisper-small")` and nothing else changes.

    python examples/compress_store_serve.py [--model tiny]
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
import tempfile

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="test2l")
    ap.add_argument("--hf", default=None)
    args = ap.parse_args()

    import jax.numpy as jnp

    from openai_whisper_compression_tpu import load_model, prune, quantize, transcribe
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.evaluation.agreement import model_agreement
    from openai_whisper_compression_tpu.evaluation.harness import samples_for_arch
    from openai_whisper_compression_tpu.models.params import size_in_mb
    from openai_whisper_compression_tpu.prune.magnitude import sparsity_report
    from openai_whisper_compression_tpu.prune.recipe import DEFAULT_RECIPE
    from openai_whisper_compression_tpu.sensitivity.architecture import (
        analyze_model, format_table)
    from openai_whisper_compression_tpu.storage.formats import (
        load_sparse_zip, verify_roundtrip)

    # 1. load + inspect
    params, arch = load_model(args.model, hf=args.hf)
    print(f"== {arch.name}: {size_in_mb(params):.1f} MB")
    print(format_table(analyze_model(params)))

    # 2. compress: thesis pruning recipe, then int8 weight-only
    compressed = quantize(prune(params, arch, recipe=DEFAULT_RECIPE), "int8")
    rep = sparsity_report(compressed)
    print(f"\n== compressed: {size_in_mb(compressed):.1f} MB, "
          f"sparsity {rep['overall_sparsity']:.2f}")

    # 3. fidelity vs the dense baseline (offline accuracy gate)
    n = samples_for_arch(arch)
    g = np.random.default_rng(0)
    mels = jnp.asarray(g.standard_normal((2, arch.num_mel_bins,
                                          2 * arch.max_source_positions)),
                       jnp.float32)
    cfg = None
    if arch.vocab_size < 50259:
        cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                           task_token_id=None, notimestamps=False)
    agr = model_agreement(params, compressed, arch, mels, decode_cfg=cfg)
    print(f"== fidelity: token_agreement={agr['token_agreement']:.3f} "
          f"mean_kl={agr['mean_kl']:.2e}")

    # 4. store + verified reload
    with tempfile.TemporaryDirectory() as d:
        path = f"{d}/model.zip"
        res = verify_roundtrip(compressed, path, "sparse_zip")
        print(f"== stored {path}: {res['file_mb']:.1f} MB on disk, "
              f"roundtrip {'OK' if res['ok'] else 'FAILED'}")
        reloaded = load_sparse_zip(path)

    # 5. serve: long-form transcription through the reloaded model
    wav = (g.standard_normal(int(1.5 * n)) * 0.1).astype(np.float32)
    out = transcribe(reloaded, arch, wav, decode_cfg=cfg, batch_size=2)
    print(f"== transcribed {out['audio_seconds']:.1f}s in "
          f"{out['num_chunks']} chunks: {out['text'][:70]!r}")


if __name__ == "__main__":
    main()
