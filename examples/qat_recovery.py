"""Compression-recovery walkthrough: PTQ vs recovery distillation vs QAT.

The reference's pipeline is one-shot — quantize, measure WER, done
(`quantization.py:42-90`); at int2 that collapses. This example shows the
recovery ladder on a tiny model, fully offline (random weights, synthetic
audio; the teacher IS the label, so no transcripts are needed):

  1. PTQ:      quantize_params(model, "int2")                (one-shot)
  2. recover:  PTQ -> dequantize -> KL-distill -> requantize (repairs
               the current rounding error)
  3. QAT:      every training forward runs on STE-fake-quantized weights
               (bit-identical to deployment), so the latent weights LEARN
               to sit on the quantizer grid

and compares each rung's fidelity against the dense baseline with the
agreement harness (token agreement / logit KL — the offline stand-in for
WER deltas).

    python examples/qat_recovery.py [--model test2l] [--steps 40]
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
    ap.add_argument("--hf", default=None)
    ap.add_argument("--method", default="int2")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--lr", type=float, default=1e-3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from openai_whisper_compression_tpu import load_model
    from openai_whisper_compression_tpu.distill import fake_quant_recovery
    from openai_whisper_compression_tpu.evaluation.agreement import (
        model_agreement)
    from openai_whisper_compression_tpu.quant.api import quantize_params
    from openai_whisper_compression_tpu.quant.qat import qat_distill

    teacher, arch = load_model(args.model, hf=args.hf)
    mels = jnp.asarray(
        np.random.default_rng(0).standard_normal(
            (2, arch.num_mel_bins, 2 * arch.max_source_positions)) * 0.1,
        jnp.float32)

    def fidelity(tag, params_q):
        r = model_agreement(teacher, params_q, arch, mels)
        print(f"{tag:12s} token_agreement={r['token_agreement']:.3f} "
              f"mean_kl={r['mean_kl']:.4f} "
              f"logit_rel_err={r['logit_rel_err']:.4f}")
        return r

    print(f"# {arch.name} {args.method}, {args.steps} recovery steps")
    ptq = quantize_params(teacher, args.method)
    r_ptq = fidelity("ptq", ptq)

    rec = fake_quant_recovery(ptq, teacher, arch, method=args.method,
                              steps=args.steps, lr=args.lr)
    fidelity("recover", rec)

    qat, hist = qat_distill(teacher, teacher, arch, method=args.method,
                            steps=args.steps, lr=args.lr,
                            preserve_sparsity=False)
    print(f"# qat loss {hist[0]:.4f} -> {hist[-1]:.4f}")
    r_qat = fidelity("qat", qat)

    assert r_qat["mean_kl"] <= r_ptq["mean_kl"], \
        "QAT should not lose to one-shot PTQ on its own objective"
    print("OK")


if __name__ == "__main__":
    main()
