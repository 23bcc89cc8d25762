"""Evaluation engine: warmup → batched transcription → WER/CER/RTF roll-up.

Single source of truth replacing the ~20 cloned copies of the reference's
eval scaffold (`evaluation.py:12-134` and its clones, SURVEY.md §0). The hot
path — features → encoder → greedy/beam decode — is one jit-compiled function
with static shapes (fixed 3000-frame mel), so there are no per-batch
recompiles; timing uses `block_until_ready` for honest RTF accounting
(replacing `torch.cuda.synchronize` at `data_utils.py:154`).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..audio import features
from ..config import DecodeConfig, EvalConfig, WhisperArch
from ..models import decode as decode_mod
from ..models.whisper import encode
from . import metrics
from .data import Utterance, batch_iterator
from .memory import MemoryTracker

logger = logging.getLogger("whisper_eval")


def samples_for_arch(arch: WhisperArch) -> int:
    """Waveform samples the encoder consumes: max_source_positions frames
    after the stride-2 conv (= 480_000 for the real Whisper family)."""
    from ..config import HOP_LENGTH

    return arch.max_source_positions * 2 * HOP_LENGTH


def make_calibration_fn(arch: WhisperArch, cal: Sequence[Utterance],
                        tokenizer=None, batch_size: int = 4,
                        n_tokens: int = 8):
    """Eager calibration callable for data-aware quantizers (GPTQ Hessian
    tap, SmoothQuant/AWQ LN-output capture — quant/gptq.py, quant/smooth.py):
    each call runs ONE full eager teacher-forced forward over a fixed
    calibration batch, so both instrumentation channels observe real
    activations (the jitted transcribe path traces once and records nothing).

    Decoder tokens are the tokenized reference text when a tokenizer is
    given (teacher forcing), else the sot prefix padded with eos. The batch
    is capped at `batch_size` so the encoder never sub-batch-chunks (which
    would break SmoothQuant's per-pass record-stream accounting —
    quant/smooth.py::collect_ln_stats).

    Activation-needing role of the reference's `with Calibration():` eval
    pass (`model_utils.py:199-208`).
    """
    from ..models.whisper import forward

    cal = list(cal)[: max(int(batch_size), 1)]
    if not cal:
        raise ValueError("data-aware calibration needs >= 1 utterance")
    n_samples = samples_for_arch(arch)
    wavs = np.zeros((len(cal), n_samples), np.float32)
    for i, u in enumerate(cal):
        a = np.asarray(u.audio, np.float32)[:n_samples]
        wavs[i, : len(a)] = a
    toks = np.full((len(cal), n_tokens), arch.eos_token_id, np.int32)
    toks[:, 0] = arch.decoder_start_token_id
    if tokenizer is not None:
        for i, u in enumerate(cal):
            ids = [t for t in tokenizer.encode(u.text)
                   if t < arch.vocab_size][: n_tokens - 1]
            toks[i, 1 : 1 + len(ids)] = np.asarray(ids, np.int32)
    wavs_j, toks_j = jnp.asarray(wavs), jnp.asarray(toks)

    def run_cal(params):
        mel = features.preprocess(wavs_j, n_mels=arch.num_mel_bins,
                                  length=n_samples)
        forward(params, arch, mel, toks_j)

    return run_cal


def make_transcribe_fn(arch: WhisperArch, cfg: DecodeConfig,
                       n_mels: int | None = None, use_pallas_mel: bool = True,
                       fast_mel: bool = False, merge_at: int | None = None,
                       merge_factor: int = 2, fast_gelu: bool = False,
                       token_logprobs: bool = False,
                       return_enc: bool = False):
    """Build the jitted end-to-end transcription function
    (waveform batch -> token ids + lengths).

    fast_mel runs the DFT/mel matmuls in bf16 (fp32 accumulation): ~4x
    faster frontend, log-mel rel. error ~1e-2. merge_at enables encoder
    adjacent-token merging; fast_gelu the tanh-approximate encoder GELU
    (see models.whisper.encode). token_logprobs=True appends the greedy
    per-position logprob trace (B, L) to the outputs (hallucination
    detection input; greedy only). return_enc=True appends the encoder
    output as the LAST element, so alignment consumers (word timestamps)
    reuse it instead of paying a second full encoder pass per window."""
    if token_logprobs and cfg.beam_size > 1:
        raise ValueError("token_logprobs is only available for greedy "
                         "decoding (beam_size == 1)")
    n_mels = n_mels or arch.num_mel_bins
    n_samples = samples_for_arch(arch)
    dft_dtype = jnp.bfloat16 if fast_mel else jnp.float32

    @jax.jit
    def fn(params, wav):
        mel = features.preprocess(wav, n_mels=n_mels, use_pallas=use_pallas_mel,
                                  length=n_samples, dft_dtype=dft_dtype).astype(
            jax.tree.leaves(params["encoder"]["ln"])[0].dtype)
        enc = encode(params, arch, mel, merge_at=merge_at,
                     merge_factor=merge_factor, fast_gelu=fast_gelu)
        if cfg.beam_size > 1:
            out = decode_mod.beam_decode(params, arch, enc, cfg)
        else:
            out = decode_mod.greedy_decode(
                params, arch, enc, cfg,
                return_token_logprobs=token_logprobs)
        return out + (enc,) if return_enc else out

    return fn


def make_speculative_transcribe_fn(arch_t: WhisperArch, arch_d: WhisperArch,
                                   cfg: DecodeConfig, gamma: int = 4,
                                   fast_mel: bool = False,
                                   fast_gelu: bool = False):
    """Jitted speculative transcription: fn(params_target, params_draft,
    wav) -> (tokens, lengths). Output is bit-exact vs the target-only greedy
    path (models/speculative.py); the draft (e.g. whisper-tiny for a
    whisper-small target) runs its own mel/encoder at its own mel-bin
    count."""
    from ..models.speculative import speculative_decode

    dft_dtype = jnp.bfloat16 if fast_mel else jnp.float32
    n_samples = samples_for_arch(arch_t)

    def enc_of(params, arch, wav):
        mel = features.preprocess(wav, n_mels=arch.num_mel_bins,
                                  use_pallas=True, length=n_samples,
                                  dft_dtype=dft_dtype).astype(
            jax.tree.leaves(params["encoder"]["ln"])[0].dtype)
        return encode(params, arch, mel, fast_gelu=fast_gelu)

    @jax.jit
    def fn(params_t, params_d, wav):
        enc_t = enc_of(params_t, arch_t, wav)
        enc_d = enc_of(params_d, arch_d, wav)
        tokens, lengths, _ = speculative_decode(
            params_t, arch_t, params_d, arch_d, enc_t, enc_d, cfg,
            gamma=gamma)
        return tokens, lengths

    return fn


_LOADERS: dict[tuple[int, int], Any] = {}


def _batch_loader(batch_size: int, n_samples: int):
    """Cached native (C++ threaded) batch assembler; numpy fallback inside."""
    from ..runtime_native import BatchLoader

    key = (batch_size, n_samples)
    if key not in _LOADERS:
        _LOADERS[key] = BatchLoader(batch_size, n_samples)
    return _LOADERS[key]


def transcribe_batch(transcribe_fn, params, batch: Sequence[Utterance],
                     tokenizer, batch_size: int,
                     n_samples: int = 30 * 16000) -> tuple[list[str], float]:
    """Pad the utterance batch to `batch_size` (static shapes → one compile),
    run the jitted fn, decode to text. Returns (texts, device_seconds)."""
    loader = _batch_loader(batch_size, n_samples)
    for i in range(batch_size):
        if i < len(batch):
            loader.submit(i, batch[i].audio)
        else:
            loader.clear(i)
    wavs = loader.flush()
    t0 = time.perf_counter()
    tokens, lengths = transcribe_fn(params, jnp.asarray(wavs))
    # host readback is the timing fence: block_until_ready alone returns
    # early on some remote TPU platforms (axon) — see bench.py
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    dt = time.perf_counter() - t0
    texts = [tokenizer.decode(tokens[i, : lengths[i]])
             for i in range(len(batch))]
    return texts, dt


def evaluate_model(params, arch: WhisperArch, dataset: list[Utterance],
                   tokenizer, eval_cfg: EvalConfig | None = None,
                   decode_cfg: DecodeConfig | None = None,
                   memory_tracker: MemoryTracker | None = None,
                   transcribe_fn=None) -> tuple[dict[str, Any], list[dict]]:
    """Full evaluation loop → (scores, transcriptions).

    Matches the reference contract (`evaluation.py:12-134`): warmup batches,
    batched transcription, corpus WER/CER, RTF = processing_time / audio_dur,
    per-batch memory logging.
    """
    eval_cfg = eval_cfg or EvalConfig()
    decode_cfg = decode_cfg or DecodeConfig()
    bs = eval_cfg.batch_size
    n_samples = samples_for_arch(arch)
    if transcribe_fn is None:
        transcribe_fn = make_transcribe_fn(arch, decode_cfg)
    if memory_tracker is not None and memory_tracker.analytic_mb is None:
        # platforms without memory_stats() (axon) would otherwise publish
        # hbm_peak_mb: 0.0 in every artifact (VERDICT r1 weak #2)
        ckv = (0.5 if decode_cfg.cross_kv_int4
               else 1.0 if decode_cfg.cross_kv_int8 else 2.0)
        memory_tracker.set_analytic(
            params, arch, bs, beam=decode_cfg.beam_size,
            kv_int8=decode_cfg.kv_int8, cross_kv_bytes=ckv,
            cache_len=-(-(decode_cfg.max_new_tokens + 8) // 64) * 64,
            audio_resident=True)

    # Warmup (compile + cache) — reference warms up via dataset.map
    # (`evaluation.py:33-63`).
    if eval_cfg.warmup_batches and dataset:
        warm = dataset[:bs]
        for _ in range(eval_cfg.warmup_batches):
            transcribe_batch(transcribe_fn, params, warm, tokenizer, bs,
                             n_samples)

    norm = metrics.resolve_normalizer(getattr(eval_cfg, "normalizer",
                                              "basic"))
    normalize = norm is not None
    # Length bucketing: batch similar-duration utterances together so a
    # lockstep to-EOT decode batch doesn't pay for one long outlier
    # (VERDICT r2 next-step #2). Stable sort; records restored to input
    # order below, corpus WER is order-invariant.
    input_order = None
    if getattr(eval_cfg, "length_bucketing", False) and len(dataset) > bs:
        input_order = {u.uid: i for i, u in enumerate(dataset)}
        dataset = sorted(dataset, key=lambda u: u.duration)
    refs: list[str] = []
    hyps: list[str] = []
    records: list[dict] = []
    total_proc = 0.0
    total_audio = 0.0
    batch_rtfs: list[float] = []
    batch_latencies: list[float] = []

    for bi, batch in enumerate(batch_iterator(dataset, bs)):
        texts, dt = transcribe_batch(transcribe_fn, params, batch, tokenizer,
                                     bs, n_samples)
        audio_dur = sum(u.duration for u in batch)
        total_proc += dt
        total_audio += audio_dur
        batch_rtfs.append(dt / max(audio_dur, 1e-9))
        batch_latencies.append(dt)
        for utt, hyp in zip(batch, texts):
            refs.append(utt.text)
            hyps.append(hyp)
            records.append({"id": utt.uid, "reference": utt.text,
                            "hypothesis": hyp, "duration": utt.duration,
                            "wer": metrics.per_sample_wer(
                                utt.text, hyp, normalize, norm)})
        if memory_tracker is not None:
            memory_tracker.log_memory(split=eval_cfg.split, batch_idx=bi,
                                      batch_size=len(batch),
                                      audio_duration=audio_dur, latency=dt)

    if input_order is not None:
        records.sort(key=lambda r: input_order.get(r["id"], 1 << 30))

    scores: dict[str, Any] = {
        "num_samples": len(refs),
        "wer": metrics.wer(refs, hyps, normalize, norm) if refs else None,
        "cer": (metrics.cer(refs, hyps, normalize, norm)
                if (refs and eval_cfg.compute_cer) else None),
        "total_processing_time_s": total_proc,
        "total_audio_duration_s": total_audio,
        "rtf": total_proc / max(total_audio, 1e-9),
        "rtfx": total_audio / max(total_proc, 1e-9),
        "avg_latency_per_batch_s": float(np.mean(batch_latencies)) if batch_latencies else None,
        "batch_rtf": {
            "mean": float(np.mean(batch_rtfs)) if batch_rtfs else None,
            "min": float(np.min(batch_rtfs)) if batch_rtfs else None,
            "max": float(np.max(batch_rtfs)) if batch_rtfs else None,
            "std": float(np.std(batch_rtfs)) if batch_rtfs else None,
        },
        "batch_size": bs,
        "split": eval_cfg.split,
        "normalizer": getattr(eval_cfg, "normalizer", "basic"),
    }
    if memory_tracker is not None:
        scores["memory"] = memory_tracker.get_memory_summary()
    return scores, records


def save_evaluation_results(scores: dict, records: list[dict],
                            model_name: str, save_path: str) -> dict[str, str]:
    """JSON artifacts mirroring reference `save_evaluation_results`
    (`evaluation.py:137-158`): {model}_results.json with metrics +
    transcriptions."""
    os.makedirs(save_path, exist_ok=True)
    metrics_path = os.path.join(save_path, f"{model_name}_results.json")
    with open(metrics_path, "w") as f:
        json.dump({"model": model_name, "metrics": scores}, f, indent=2,
                  default=str)
    tr_path = os.path.join(save_path, f"{model_name}_transcriptions.json")
    with open(tr_path, "w") as f:
        json.dump(records, f, indent=2)
    return {"metrics": metrics_path, "transcriptions": tr_path}


def print_evaluation_summary(all_scores: dict[str, dict]) -> str:
    """Console summary table (≈ reference `print_evaluation_summary`,
    `evaluation.py:161-178`)."""
    lines = [f"{'config':<40} {'WER':>8} {'CER':>8} {'RTFx':>8} {'HBM peak MB':>12}"]
    for name, s in all_scores.items():
        wer = f"{s['wer']:.4f}" if s.get("wer") is not None else "-"
        cer = f"{s['cer']:.4f}" if s.get("cer") is not None else "-"
        rtfx = f"{s['rtfx']:.2f}" if s.get("rtfx") else "-"
        hbm = "-"
        mem = s.get("memory") or {}
        if mem.get("hbm_peak_mb"):
            hbm = f"{mem['hbm_peak_mb']['max']:.0f}"
        lines.append(f"{name:<40} {wer:>8} {cer:>8} {rtfx:>8} {hbm:>12}")
    out = "\n".join(lines)
    logger.info("\n%s", out)
    print(out)
    return out
