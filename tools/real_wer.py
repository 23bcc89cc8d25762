#!/usr/bin/env python
"""One-command real-checkpoint WER dossier (VERDICT r2 next-step #1).

Produces the BASELINE comparison artifact the reference's central claim
rests on: FP32 whisper-small, LibriSpeech test-clean, 100 utterances,
WER vs the reference's recorded 0.0473 (`/root/reference/quantization/
notebooks/baseline evaluation and EDA.ipynb` cell 15, harness at
`/root/reference/evaluation.py:12-134`), then the int8 delta against the
0.3-abs north star.

Weight resolution order (first hit wins — ANY mountable weight source
becomes a WER artifact with zero code changes):
  1. --weights PATH            HF snapshot/export dir, OpenAI original .pt,
                               bare torch state dict, bare .safetensors
  2. local npz cache           (tools/fetch_checkpoint.py)
  3. mounted HF hub cache      (read directly; partial caches accepted)
  4. ~/.cache/whisper/<x>.pt   (where openai-whisper downloads originals)
  5. network via transformers  (when egress exists)

Data resolution: --audio-dir, else the tools/fetch_librispeech.py cache,
else (with network) a direct OpenSLR fetch.

    make real-wer              # full artifact (needs weights + audio)
    make real-wer-rehearse     # zero-egress end-to-end rehearsal: builds
                               # fake checkpoints in ALL THREE formats,
                               # runs the identical resolution + eval +
                               # artifact path on synthetic audio
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REFERENCE = {
    "wer": 0.0473, "cer": 0.0174, "median_wer": 0.0,
    "avg_time_per_sample_s": 0.528,
    "hardware": "Apple MPS, batch 1, HF generate",
    "source": "reference notebook 'baseline evaluation and EDA.ipynb' "
              "cell 15 (100 test-clean utts, whisper-small FP32)",
}
NORTH_STAR_ABS_WER = 0.3  # int8 within 0.3 abs WER of FP32 at >10x realtime


def resolve_weights(model: str, weights: str | None, dtype):
    """(params, arch, source-string) via the documented resolution order."""
    from openai_whisper_compression_tpu.models import convert

    if weights:
        params, arch = convert.load_checkpoint(weights, dtype)
        return params, arch, f"--weights {weights}"
    hit = convert.load_cached_model(model, dtype)
    if hit is not None:
        return hit[0], hit[1], f"npz cache ({model})"
    snap = convert.find_in_hf_cache(model)
    if snap is not None:
        params, arch = convert.load_checkpoint(snap, dtype)
        return params, arch.replace(name=model), f"HF hub cache ({snap})"
    short = model.split("whisper-", 1)[-1]
    oai = os.path.join(os.path.expanduser("~"), ".cache", "whisper",
                       f"{short}.pt")
    if os.path.exists(oai):
        params, arch = convert.load_checkpoint(oai, dtype)
        return params, arch.replace(name=model), f"OpenAI original ({oai})"
    try:
        params, arch = convert.load_hf_model(model, dtype)
        return params, arch, f"HF hub (network, {model})"
    except Exception as e:
        raise SystemExit(
            f"no weights found for {model}: tried --weights, the npz cache, "
            f"the HF hub cache, {oai}, and the network ({type(e).__name__}: "
            f"{e}).\nMount any checkpoint and pass --weights, or run "
            f"tools/fetch_checkpoint.py on a networked host.")


def resolve_audio_dir(audio_dir: str | None) -> str:
    if audio_dir:
        return audio_dir
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import fetch_librispeech as fls

    split_dir = os.path.join(fls.cache_dir(), "LibriSpeech", "test-clean")
    if os.path.isdir(split_dir):
        return split_dir
    try:
        return fls.fetch_split("test-clean")
    except Exception as e:
        raise SystemExit(
            f"no LibriSpeech audio found at {split_dir} and the OpenSLR "
            f"fetch failed ({type(e).__name__}: {e}).\nRun "
            f"tools/fetch_librispeech.py test-clean on a networked host, "
            f"or pass --audio-dir <unpacked test-clean dir>.")


def run_eval(params, arch, dataset, tok, batch_size, max_new_tokens,
             label, **cfg_kw):
    from openai_whisper_compression_tpu.config import (DecodeConfig,
                                                       EvalConfig)
    from openai_whisper_compression_tpu.evaluation import harness
    from openai_whisper_compression_tpu.evaluation.memory import (
        MemoryTracker)

    cfg_kw.setdefault(
        "notimestamps", arch.no_timestamps_token_id < arch.vocab_size)
    cfg = DecodeConfig(max_new_tokens=max_new_tokens, **cfg_kw)
    scores, _ = harness.evaluate_model(
        params, arch, dataset, tok,
        eval_cfg=EvalConfig(batch_size=batch_size, split="test_clean",
                            normalizer="whisper"),
        decode_cfg=cfg, memory_tracker=MemoryTracker(label))
    return scores


def run_longform(params, arch, dataset, tok, batch_size, max_new_tokens,
                 group: int):
    """Long-form config: concatenate `group` consecutive utterances per
    stream (0.2 s gaps, references joined) and score the timestamp-seek
    loop (evaluation/longform.py) — the reference has no >30 s path at
    all; this proves ours on real data the day weights arrive."""
    import numpy as np

    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.evaluation import metrics
    from openai_whisper_compression_tpu.evaluation.longform import (
        transcribe_seek_batch)

    sr = 16000
    gap = np.zeros(int(0.2 * sr), np.float32)
    ds = list(dataset)
    wavs, refs = [], []
    for i in range(0, len(ds) - len(ds) % group, group):
        g = ds[i: i + group]
        parts = []
        for u in g:
            parts.append(np.asarray(u.audio, np.float32))
            parts.append(gap)
        wavs.append(np.concatenate(parts[:-1]))
        refs.append(" ".join(u.text for u in g))
    if not wavs:
        return {"num_streams": 0}
    cfg = DecodeConfig(max_new_tokens=max_new_tokens, notimestamps=False)
    t0 = time.time()
    res = transcribe_seek_batch(params, arch, wavs, tok, cfg,
                                batch_size=min(batch_size, len(wavs)))
    dt = time.time() - t0
    hyps = [r["text"] for r in res]
    norm = metrics.resolve_normalizer("whisper")
    audio_s = sum(len(w) for w in wavs) / sr
    return {"num_streams": len(wavs), "utts_per_stream": group,
            "wer": metrics.wer(refs, hyps, norm is not None, norm),
            "windows": sum(r["num_windows"] for r in res),
            "audio_s": round(audio_s, 1),
            "rtfx": round(audio_s / max(dt, 1e-9), 2)}


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--model", default="openai/whisper-small")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--audio-dir", default=None)
    ap.add_argument("--samples", type=int, default=100)
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--max-new-tokens", type=int, default=128)
    ap.add_argument("--quant", default="int8",
                    help="compressed variant for the delta row "
                         "('' skips it)")
    ap.add_argument("--out", default="WER_REAL.json")
    ap.add_argument("--no-full", dest="full", action="store_false",
                    help="skip the beam5/timestamps/longform matrix rows")
    ap.add_argument("--rehearse", action="store_true",
                    help="zero-egress end-to-end rehearsal on fake "
                         "checkpoints in all three formats")
    args = ap.parse_args()

    if args.rehearse:
        return rehearse(args)

    import jax.numpy as jnp

    from openai_whisper_compression_tpu.evaluation.data import (
        prepare_datasets)
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        load_tokenizer)
    from openai_whisper_compression_tpu.quant.api import quantize_params

    params, arch, source = resolve_weights(args.model, args.weights,
                                           jnp.float32)
    print(f"weights: {source}")
    audio_dir = resolve_audio_dir(args.audio_dir)
    print(f"audio:   {audio_dir}")
    tok = load_tokenizer(args.model if "/" in args.model
                         else f"openai/whisper-{args.model}")
    if tok is None:
        raise SystemExit(
            "the real Whisper tokenizer is unavailable (no HF cache, no "
            "network): a WER scored with the placeholder word tokenizer "
            "would be meaningless, refusing. Mount a transformers cache "
            "holding the tokenizer files.")
    datasets = prepare_datasets(num_cal=0, num_test=args.samples,
                                audio_dir=audio_dir)
    artifact = build_artifact(args, params, arch, datasets["test_clean"],
                              tok, quantize_params, rehearsal=False,
                              weights_source=source, audio_source=audio_dir)
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(json.dumps({k: artifact[k] for k in
                      ("fp32", "compressed", "north_star")}, indent=2))
    print(f"wrote {args.out}")
    return 0


def build_artifact(args, params, arch, dataset, tok, quantize_params, *,
                   rehearsal, weights_source, audio_source):
    t0 = time.time()
    fp32 = run_eval(params, arch, dataset, tok, args.batch_size,
                    args.max_new_tokens, f"{arch.name}_fp32")
    row = {
        "model": args.model, "rehearsal": rehearsal,
        "weights_source": weights_source, "audio_source": audio_source,
        "n_samples": args.samples,
        "fp32": fp32,
        "reference": REFERENCE,
        "delta_wer_vs_reference": round(fp32["wer"] - REFERENCE["wer"],
                                        4) if not rehearsal else None,
    }
    if args.quant:
        q = quantize_params(params, args.quant)
        comp = run_eval(q, arch, dataset, tok, args.batch_size,
                        args.max_new_tokens, f"{arch.name}_{args.quant}")
        row["compressed"] = {"method": args.quant, **comp}
        delta = comp["wer"] - fp32["wer"]
        row["north_star"] = {
            "criterion": f"{args.quant} within {NORTH_STAR_ABS_WER} abs WER "
                         f"of FP32 at >10x realtime",
            "delta_abs_wer": round(delta, 4),
            "rtfx": comp.get("rtfx"),
            "pass": bool(delta <= NORTH_STAR_ABS_WER
                         and (comp.get("rtfx") or 0) > 10),
        }
    if getattr(args, "full", True):
        # the full reference-comparable option matrix in the same command
        # (VERDICT r3 next-step #8): beam-5 with HF length-penalty
        # semantics, timestamp decoding, and one long-form config — each
        # oracle-pinned offline by tests/test_hf_generate_parity.py
        beam = run_eval(params, arch, dataset, tok,
                        max(args.batch_size // 2, 1), args.max_new_tokens,
                        f"{arch.name}_beam5", beam_size=5,
                        length_penalty=1.0)
        row["beam5"] = {k: beam[k] for k in
                        ("wer", "cer", "rtfx", "num_samples")}
        if arch.no_timestamps_token_id + 1 < arch.vocab_size:
            ts = run_eval(params, arch, dataset, tok, args.batch_size,
                          args.max_new_tokens, f"{arch.name}_timestamps",
                          notimestamps=False)
            row["timestamps"] = {k: ts[k] for k in
                                 ("wer", "cer", "rtfx", "num_samples")}
            row["longform"] = run_longform(
                params, arch, dataset, tok, args.batch_size,
                args.max_new_tokens, group=2 if rehearsal else 4)
    row["wall_seconds"] = round(time.time() - t0, 1)
    return row


def rehearse(args) -> int:
    """Offline end-to-end rehearsal: constructs fake checkpoints in ALL
    THREE ingestion formats from a random test model, resolves each through
    the same loader surface, checks pytree identity, then runs the identical
    eval + artifact path on synthetic audio."""
    import tempfile

    import numpy as np
    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.evaluation.data import (
        prepare_datasets)
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        default_tokenizer)
    from openai_whisper_compression_tpu.models import convert, params as P
    from openai_whisper_compression_tpu.quant.api import quantize_params

    # ts-capable tiny arch so the timestamps + longform matrix
    # rows rehearse too (VERDICT r3 next-step #8)
    arch = ARCHS["test2l-ts"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    sd = convert.to_hf_state_dict(params)
    formats = {}
    with tempfile.TemporaryDirectory() as d:
        # (1) OpenAI original .pt
        import torch

        ckpt = convert.to_openai_checkpoint(params, arch)
        pt = os.path.join(d, "test2l.pt")
        torch.save({"dims": ckpt["dims"], "model_state_dict": {
            k: torch.from_numpy(np.array(v))
            for k, v in ckpt["model_state_dict"].items()}}, pt)
        # (2) bare safetensors (+ sibling config for exact heads)
        st = os.path.join(d, "model.safetensors")
        convert.write_safetensors(sd, st)
        with open(os.path.join(d, "config.json"), "w") as f:
            json.dump({
                "vocab_size": arch.vocab_size,
                "num_mel_bins": arch.num_mel_bins, "d_model": arch.d_model,
                "encoder_layers": arch.encoder_layers,
                "encoder_attention_heads": arch.encoder_heads,
                "decoder_layers": arch.decoder_layers,
                "decoder_attention_heads": arch.decoder_heads,
                "encoder_ffn_dim": arch.ffn_dim,
                "max_source_positions": arch.max_source_positions,
                "max_target_positions": arch.max_target_positions,
                "eos_token_id": arch.eos_token_id,
                "decoder_start_token_id": arch.decoder_start_token_id}, f)
        # (3) HF snapshot dir == d itself (config.json + model.safetensors)
        for label, path in (("openai_pt", pt), ("safetensors", st),
                            ("hf_dir", d)):
            loaded, a = convert.load_checkpoint(path)
            same = all(
                np.array_equal(np.asarray(x), np.asarray(y))
                for x, y in zip(jax.tree.leaves(loaded),
                                jax.tree.leaves(params)))
            formats[label] = {"path": os.path.basename(path) or "dir",
                              "loaded": True, "pytree_identical": bool(same)}
            assert same, f"{label} roundtrip diverged"
        print("rehearsed ingestion formats:",
              json.dumps(formats, indent=2))

        # identical eval + artifact path, synthetic data
        datasets = prepare_datasets(num_cal=0, num_test=4)
        tok = default_tokenizer(arch)
        args.samples = 4
        args.max_new_tokens = 8
        artifact = build_artifact(
            args, params, arch, datasets["test_clean"], tok,
            quantize_params, rehearsal=True,
            weights_source="rehearsal (fake checkpoints, 3 formats)",
            audio_source="synthetic")
        artifact["rehearsed_formats"] = formats
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=2)
    print(f"wrote {args.out} (rehearsal)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
