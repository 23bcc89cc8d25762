"""Headline benchmark: whisper-small greedy transcription throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", "rows"}.
The headline value is the pipelined fixed-25-token regression metric (the
r2 accounting); "rows" records the full workload family every round
(VERDICT r2 next-step #2):
  fenced        per-batch-fenced fixed-25 (the r1/r2-early accounting, kept
                so the BENCH series stays comparable)
  real_decode   decode-to-EOT, ragged lengths, p50/p95 per-batch latency —
                the reference's RTF accounting shape (evaluation.py:77-106)
  longform      multi-stream timestamp-seek long-form transcription
                (transcribe_seek_batch, 8x60s streams)
  continuous_batching  slot-recycling vs batch-synchronous wave scheduling
                on ragged token-budgeted requests (same engine, token
                equality asserted; models/continuous.py)

Workload: whisper-small architecture (random weights — no egress for real
checkpoints), bf16 (or int8 weight-only via --quant), batch B of 30 s-padded
synthetic utterances, fused-Pallas log-mel frontend, jitted greedy decode for
a fixed 25 new tokens (EOT suppressed so every run does identical work; the
reference's GFLOPs model assumes a 25-token decode,
`unstructured_L1_baseline.py:100-177`).

Metric: RTFx = audio-seconds transcribed per wall-second, counting 7.42 s of
audio per utterance (LibriSpeech test-clean mean ≈ 5.4 h / 2620 utts).
Baseline: the reference's recorded 0.528 s/sample (whisper-small FP32 greedy,
Apple MPS, batch 1 — BASELINE.md) → RTFx ≈ 14.05.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import time

import numpy as np

AVG_UTT_SECONDS = 7.42
BASELINE_RTFX = AVG_UTT_SECONDS / 0.528  # ≈ 14.05
T_START = time.monotonic()


class Artifact:
    """Incrementally-emitted bench artifact (VERDICT r4 next-step #1).

    Round 4 recorded NO headline because the composite outgrew the driver
    timeout and the artifact printed only after every row (rc=124,
    parsed:null). Now the full JSON line is (re)printed to stdout after
    the headline and after EVERY completed row — whatever parses the LAST
    stdout line always sees the most complete artifact, even under
    SIGKILL. A SIGTERM/SIGINT handler flushes once more and exits 0, and
    `--budget-s` skips (and NAMES, never silently) rows that would run
    past the driver window.
    """

    def __init__(self, budget_s: float):
        self.doc: dict = {}
        self.rows: dict = {}
        self.budget_s = budget_s
        self._handlers_installed = False

    def set_headline(self, metric: str, value: float, unit: str) -> None:
        self.doc = {"metric": metric, "value": value, "unit": unit,
                    "vs_baseline": round(value / BASELINE_RTFX, 2),
                    "rows": self.rows}
        self.emit()

    def emit(self) -> None:
        if self.doc:
            print(json.dumps(self.doc), flush=True)

    def elapsed(self) -> float:
        return time.monotonic() - T_START

    def over_budget(self, est_s: float = 0.0) -> bool:
        return self.elapsed() + est_s > self.budget_s

    def install_handlers(self) -> None:
        """On SIGTERM/SIGINT: flush the current artifact and exit 0 so a
        driver-side `timeout` still records a parsed headline. NB the
        handler only runs between Python bytecodes — a blocking tunnel
        call delays it, which is why emit() also runs after every row."""
        if self._handlers_installed:
            return
        self._handlers_installed = True

        def _flush(signum, frame):
            self.rows.setdefault(
                "_interrupted", f"signal {signum} at {self.elapsed():.0f}s")
            self.emit()
            sys.stdout.flush()
            os._exit(0)

        signal.signal(signal.SIGTERM, _flush)
        signal.signal(signal.SIGINT, _flush)

    def run_row(self, name: str, thunk, est_s: float = 30.0) -> None:
        """Measure one row, guarded: an aux-row failure or a budget
        overrun must not sink the recorded headline."""
        if self.over_budget(est_s):
            self.rows[name] = {"skipped": f"budget ({self.budget_s:.0f}s; "
                                          f"elapsed {self.elapsed():.0f}s, "
                                          f"row est {est_s:.0f}s)"}
            print(f"# {name}: SKIPPED for budget", file=sys.stderr)
            self.emit()
            return
        t0 = time.monotonic()
        try:
            row = thunk()
            if isinstance(row, dict):
                row.setdefault("t_row_s", round(time.monotonic() - t0, 1))
            self.rows[name] = row
        except Exception as e:  # noqa: BLE001 — recorded, not swallowed
            self.rows[name] = {"error": repr(e),
                               "t_row_s": round(time.monotonic() - t0, 1)}
        print(f"# {name}: {self.rows[name]}", file=sys.stderr)
        self.emit()


def _serve_measure(params, arch, cfg, fn, args, batch: int | None = None,
                   n_req: int | None = None) -> dict:
    """Steady-state serving throughput rows: N requests through the
    dynamic-batching TranscriptionService (native loader overlaps feature
    prep with TPU compute); counts end-to-end wall including batching."""
    import sys

    from openai_whisper_compression_tpu.evaluation.tokenizer import default_tokenizer
    from openai_whisper_compression_tpu.serving import TranscriptionService

    batch = batch or args.batch
    n_req = n_req or batch * 4
    tok = default_tokenizer(arch)
    # int16 PCM transfer halves the host->device audio stream. NB on
    # tunnelled backends (axon) the upload still dominates this metric —
    # it is an environment artifact, not TPU throughput (the greedy
    # headline keeps audio device-resident).
    svc = TranscriptionService(params, arch, tok, cfg,
                               batch_size=batch, max_wait_ms=5,
                               transcribe_fn=fn, transfer=args.transfer,
                               pipeline=args.serve_pipeline)
    rng = np.random.default_rng(0)
    wavs = [rng.standard_normal(int(AVG_UTT_SECONDS * 16000)
                                ).astype(np.float32) * 0.1
            for _ in range(n_req)]
    if args.wire == "flac":
        # client-side FLAC wire: ~2x less request payload than int16 PCM,
        # decoded inside the native loader's worker pool (serving.py)
        from openai_whisper_compression_tpu.audio.flac_encode import (
            encode_waveform)

        payloads = [encode_waveform(w) for w in wavs]
        submit = svc.submit_flac
    else:
        payloads = wavs
        submit = svc.submit
    # warmup: compile every dispatch bucket, then one end-to-end request
    # to warm the native loader/wire path (remote-TPU compiles take
    # minutes — transcribe's auto-timeout assumes a compiled program)
    svc.warmup()
    svc.transcribe(wavs[0], timeout=900.0)
    svc.stats = type(svc.stats)()  # exclude warmup/compile from stats
    t0 = time.perf_counter()
    if args.arrival_rtfx:
        # OPEN-LOOP: requests arrive paced at a target aggregate load
        # (args.arrival_rtfx x realtime of offered audio), so the latency
        # percentiles measure steady-state service latency instead of the
        # depth of a burst queue (closed-loop submits all N at t=0).
        interval = AVG_UTT_SECONDS / args.arrival_rtfx
        futs = []
        for i, p in enumerate(payloads):
            target = t0 + i * interval
            now = time.perf_counter()
            if target > now:
                time.sleep(target - now)
            futs.append(submit(p))
    else:
        futs = [submit(p) for p in payloads]
    for f in futs:
        f.result(timeout=600)
    wall = time.perf_counter() - t0
    svc.close()
    stats = svc.stats.snapshot()
    rtfx = n_req * AVG_UTT_SECONDS / wall
    print(f"# serve stats: {stats}", file=sys.stderr)
    # end-to-end vs model-call-busy, both MEASURED in this run (no
    # projections): busy_rtfx = audio / model-call seconds (dispatch+
    # readback-fenced), the device-side throughput the e2e number
    # approaches as host/wire overheads shrink
    return {"e2e_rtfx": round(rtfx, 2),
            "busy_rtfx": round(stats["rtfx"], 2),
            "n_req": n_req, "batch": batch, "wire": args.wire,
            "pipeline": args.serve_pipeline,
            "occupancy": round(stats["mean_batch_occupancy"], 3),
            "latency_p50_ms": round(stats.get("latency_p50_ms", 0)),
            "latency_p95_ms": round(stats.get("latency_p95_ms", 0))}


def _serve_bench(params, arch, cfg, fn, args) -> None:
    rows = _serve_measure(params, arch, cfg, fn, args)
    print(json.dumps({
        "metric": f"whisper-{args.model}-{args.quant} serving RTFx "
                  f"({rows['n_req']} reqs, batch {args.batch}, "
                  f"{args.tokens} tok, "
                  f"wire={args.wire}, transfer={args.transfer}, "
                  f"pipe={args.serve_pipeline}, "
                  + (f"open-loop {args.arrival_rtfx}x, "
                     if args.arrival_rtfx else "closed-loop, ")
                  + f"audio={AVG_UTT_SECONDS}s/utt)",
        "value": rows["e2e_rtfx"],
        "unit": "x_realtime",
        "vs_baseline": round(rows["e2e_rtfx"] / BASELINE_RTFX, 2),
        "rows": rows,
    }))


def _verify_tie_flips(params, arch, mismatches, wavs, n_samples: int,
                      p_len: int, pad_len: int) -> list[dict]:
    """Adversarial check on every CB token mismatch (VERDICT r4 #3/#4):
    a scheduler-vs-wave divergence is acceptable ONLY if it is a bf16
    argmax tie-flip — at the first divergent position the two candidate
    tokens must be the recomputed logits' top-2 with a gap inside bf16
    rounding noise. Anything else is a scheduling bug and must FAIL the
    bench. Returns one report dict per mismatch.

    The recompute is a THIRD, independent path (full-context
    decode_logits, not the fused step kernel both schedulers share), so
    a genuine tie shows ~zero gap here too; the gap is normalized by the
    logit std because random-weight logit scales are arbitrary."""
    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.audio import features
    from openai_whisper_compression_tpu.models import whisper

    enc_fn = jax.jit(lambda p, m: whisper.encode(p, arch, m))
    dl = jax.jit(lambda p, t, e: whisper.decode_logits(p, arch, t, e))
    # second recompute path: the same row duplicated to batch 2 — a
    # different batch embedding changes XLA's tiling/reduction order, so
    # |logits_1row - logits_2row| MEASURES the cross-path bf16 noise at
    # this exact position (the same mechanism that separates the two
    # schedulers' compute). The tie criterion is then scale-free: both
    # flip tokens must sit within a few measured-noise-widths of the max
    # logit. A fixed ulp count misclassified degenerate-logit positions
    # (late decode tail on noise audio: many tokens within ~5%, every
    # path picks a different argmax — numerical degeneracy, not a
    # scheduling bug).
    eot = arch.eos_token_id
    reports = []
    for (req, ta_seq, tb_seq) in mismatches:
        n = min(len(ta_seq), len(tb_seq))
        div = next((i for i in range(n) if ta_seq[i] != tb_seq[i]), n)
        ta = int(ta_seq[div]) if div < len(ta_seq) else eot
        tb = int(tb_seq[div]) if div < len(tb_seq) else eot
        wav = np.zeros((n_samples,), np.float32)
        w = np.asarray(wavs[req], np.float32)
        wav[: min(len(w), n_samples)] = w[:n_samples]
        mel = features.preprocess(jnp.asarray(wav[None]),
                                  arch.num_mel_bins, length=n_samples)
        enc = enc_fn(params, mel.astype(jnp.bfloat16))
        ids = np.full((1, pad_len), eot, np.int32)
        ids[0, :div] = np.asarray(ta_seq[:div], np.int32)
        jids = jnp.asarray(ids)
        logits = np.asarray(
            dl(params, jids, enc)[0, div - 1].astype(jnp.float32))
        # measured cross-path noise: same computation at batch 2
        l2 = np.asarray(dl(params, jnp.concatenate([jids, jids], 0),
                           jnp.concatenate([enc, enc], 0))
                        [0, div - 1].astype(jnp.float32))
        noise = float(np.max(np.abs(logits - l2)))
        ulp = max(abs(float(logits[ta])), abs(float(logits[tb])),
                  1e-6) * 2.0 ** -8
        thresh = 4.0 * max(ulp, noise)
        mx = float(logits.max())
        d_ta = mx - float(logits[ta])
        d_tb = mx - float(logits[tb])
        reports.append({"req": int(req), "pos": int(div),
                        "tokens": (ta, tb),
                        "noise": round(noise, 4),
                        "gap_vs_thresh": round(max(d_ta, d_tb)
                                               / max(thresh, 1e-9), 2),
                        "is_tie_flip": max(d_ta, d_tb) <= thresh})
    return reports


def _cb_measure(params, arch, args, tokens: int) -> dict:
    """Continuous batching vs batch-synchronous waves on ONE ragged set.

    The reference serves strictly batch-synchronously through HF
    `generate` (`data_utils.py:152`): every batch runs as long as its
    longest member. `ContinuousBatcher` retires a finished slot within
    one chunk and re-arms it from the queue, so device steps track the
    SUM of lengths, not waves x max. Raggedness comes from per-request
    token budgets (serving `max_tokens`; with random weights natural EOT
    is degenerate — accuracy-side EOT behavior is pinned by
    tests/test_continuous.py's crafted-EOT fixture) drawn from a
    lognormal speech-like length distribution. BOTH schedulers run the
    same engine, kernels, and budgets — wave mode only admits into an
    empty pool — so the ratio is pure scheduling, and token equality
    between the two is asserted. Returns the rows dict."""
    import dataclasses

    import jax.numpy as jnp

    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.continuous import (CBStats,
                                                           ContinuousBatcher)

    cfg = DecodeConfig(max_new_tokens=tokens,
                       kv_int8=args.kv_int8,
                       cross_kv_int8=args.cross_kv_int8,
                       cross_kv_int4=args.cross_kv_int4,
                       cross_kv_pool=args.cross_kv_pool,
                       cross_kv_merge=args.cross_kv_merge,
                       suppress_tokens=())
    import jax

    n_samples = arch.max_source_positions * 2 * 160
    rng = np.random.default_rng(1)
    n_req = args.batch * 4
    # request audio is generated ON-DEVICE (ragged noise, zero-padded):
    # the old host-built pool uploaded n_req x 30 s of f32 (~737 MB at
    # batch 96) before the row could start — 12+ minutes whenever the
    # tunnel's fresh-content bandwidth collapses (measured down to
    # 1 MB/s). Raggedness (the thing the scheduler absorbs) comes from
    # the per-request token budgets + lengths either way.
    req_lens = np.array([int(rng.integers(16000, n_samples))
                         for _ in range(n_req)])

    @jax.jit
    def _gen_pool(key, lens):
        noise = jax.random.normal(key, (n_req, n_samples),
                                  jnp.float32) * 0.35
        mask = jnp.arange(n_samples)[None, :] < lens[:, None]
        return jnp.where(mask, noise, 0.0)

    wavs = _gen_pool(jax.random.PRNGKey(1), jnp.asarray(req_lens))
    # speech-like token-length spread (LibriSpeech test-clean transcripts
    # span ~1-90 tokens with a long right tail); median ~tokens/2
    caps = np.clip(np.round(rng.lognormal(np.log(tokens / 2), 0.55, n_req)),
                   2, tokens).astype(int).tolist()
    audio_s = n_req * AVG_UTT_SECONDS  # same accounting as --serve

    cb = ContinuousBatcher(params, arch, cfg, batch=args.batch,
                           chunk=args.cb_chunk,
                           admit_lanes=args.cb_lanes or max(2,
                                                            args.batch // 4),
                           fast_gelu=args.fast_gelu,
                           transfer=("int16" if args.transfer == "int16"
                                     else "float32"))
    t0 = time.perf_counter()
    cb.warmup()
    print(f"# cb compile+warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    # default: device-staged audio pool, so both schedulers' walls measure
    # scheduling + compute, not the host->device audio wire both pay
    # identically (--cb-upload keeps the per-admit uploads in the wall,
    # building host copies of the device-generated audio)
    if args.cb_upload:
        reqs = [np.asarray(wavs[i])[: req_lens[i]] for i in range(n_req)]
    else:
        reqs = wavs
        # compile the admit gather before either timed run
        reqs[jnp.zeros((cb.plan.admit_lanes,), jnp.int32)].block_until_ready()

    # ---- batch-synchronous comparator: same engine, wave scheduling ----
    sync_stats = CBStats()
    sync_tokens = cb.transcribe_all(reqs, stats=sync_stats,
                                    max_new=caps, wave=True)
    # ---- continuous batching on the identical request set ----
    stats = CBStats()
    got = cb.transcribe_all(reqs, stats=stats, max_new=caps)
    # ---- + one-deep chunk pipeline (sync readback rides under the next
    # chunk's execution; same compiled programs, host-loop change only) ---
    ov_stats = CBStats()
    ov_tokens = cb.transcribe_all(reqs, stats=ov_stats, max_new=caps,
                                  overlap=True)

    mism_pairs = [(i, g, r) for i, (g, r) in enumerate(zip(got, sync_tokens))
                  if not np.array_equal(g, r)]
    ov_pairs = [(i, g, r) for i, (g, r) in enumerate(zip(ov_tokens, got))
                if not np.array_equal(g, r)]
    mismatch, ov_mismatch = len(mism_pairs), len(ov_pairs)
    # "token equality asserted" is enforced, not just reported: every
    # mismatch must be PROVEN a bf16 argmax tie-flip (top-2 of an
    # independent recompute, gap inside bf16 rounding) — a count-only
    # tolerance let a scheduling bug hide inside the allowance
    # (VERDICT r4 #4). The count cap is a 5% backstop on top of the
    # per-mismatch proof (kv_int8 — default since r5 — adds a second
    # rounding surface, so knife-edge pairs flip slightly more often;
    # measured 10/384 vs 7/384 at kv_bf16, all at the same token pair).
    tol = max(1, len(got) // 20)
    if mismatch > tol or ov_mismatch > tol:
        raise AssertionError(
            f"continuous-batching token mismatch beyond bf16 tie-flip "
            f"tolerance ({tol}): cb-vs-wave={mismatch}, "
            f"overlap-vs-cb={ov_mismatch} of {len(got)} requests")
    flip_reports = []
    if mism_pairs or ov_pairs:
        flip_reports = _verify_tie_flips(
            params, arch, mism_pairs + ov_pairs, wavs, n_samples,
            cb.plan.p_len, cb.plan.p_len + cb.plan.max_new + 1)
        # second line of evidence for near-threshold gaps: a DETERMINISTIC
        # scheduling bug flips a given token pair consistently in one
        # direction; reduction-order noise flips it both ways. A pair
        # observed in BOTH directions across the run is order-noise even
        # when its gap sits a few noise-widths wide (degenerate-logit
        # tails cluster several tokens within ~5%).
        dirs: dict = {}
        for r in flip_reports:
            dirs.setdefault(frozenset(r["tokens"]), set()).add(r["tokens"])
        for r in flip_reports:
            if not r["is_tie_flip"] and len(dirs[frozenset(r["tokens"])]) > 1:
                r["is_tie_flip"] = True
                r["bidirectional"] = True
        bad = [r for r in flip_reports if not r["is_tie_flip"]]
        print(f"# cb tie-flip reports: {flip_reports}", file=sys.stderr)
        if bad:
            raise AssertionError(
                f"cb token mismatches are NOT bf16 tie-flips — "
                f"scheduling bug: {bad}")
    lens = np.array([len(t) for t in sync_tokens])
    cb_rtfx = audio_s / stats.wall_seconds
    ov_rtfx = audio_s / ov_stats.wall_seconds
    sync_rtfx = audio_s / sync_stats.wall_seconds

    # Length-matched comparator (honest gate accounting): the 25-token
    # headline does ~2/3 of this row's decode work per utterance (lognormal
    # budgets mean ~33 gen tokens), so cb/headline conflates scheduling
    # with workload. Measure the SAME pipelined fixed-token decoder at the
    # ragged set's mean length — the number a perfect scheduler with zero
    # raggedness would post on this workload.
    from openai_whisper_compression_tpu.evaluation.harness import (
        make_transcribe_fn)

    eq_tokens = max(int(round(float(lens.mean()))) - cb.plan.p_len, 1)
    cfg_eq = dataclasses.replace(
        cfg, max_new_tokens=eq_tokens, suppress_tokens=(arch.eos_token_id,))
    fn_eq = make_transcribe_fn(arch, cfg_eq, fast_mel=True,
                               fast_gelu=args.fast_gelu)
    eq_wavs = [wavs[k * args.batch: (k + 1) * args.batch]
               for k in range(2)]          # device pool slices, no upload
    t0 = time.perf_counter()
    np.asarray(fn_eq(params, eq_wavs[0])[0])
    print(f"# cb equiv compile+warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)
    eq_rtfx, _ = _measure_pipelined(fn_eq, params, eq_wavs, args, 6)
    print(f"# cb stats: {stats.snapshot()}", file=sys.stderr)
    print(f"# cb overlap stats: {ov_stats.snapshot()} "
          f"mismatches_vs_cb={ov_mismatch}", file=sys.stderr)
    print(f"# sync stats: {sync_stats.snapshot()} mismatches={mismatch} "
          f"len[min/mean/max]={lens.min()}/{lens.mean():.1f}/{lens.max()}",
          file=sys.stderr)
    return {
        "cb_rtfx": round(cb_rtfx, 2),
        "cb_overlap_rtfx": round(ov_rtfx, 2),
        "batch_sync_rtfx": round(sync_rtfx, 2),
        "fixed_equiv_rtfx": round(eq_rtfx, 2),
        "fixed_equiv_tokens": eq_tokens,
        "overlap_vs_equiv": round(ov_rtfx / eq_rtfx, 3),
        "speedup_vs_sync": round(cb_rtfx / sync_rtfx, 3),
        "overlap_speedup_vs_sync": round(ov_rtfx / sync_rtfx, 3),
        "cb_device_steps": stats.device_steps,
        "sync_device_steps": sync_stats.device_steps,
        "step_ratio": round(stats.device_steps
                            / max(sync_stats.device_steps, 1), 3),
        "cb_occupancy": round(stats.occupancy, 3),
        "sync_occupancy": round(sync_stats.occupancy, 3),
        "gen_len_mean": round(float(lens.mean()), 1),
        "gen_len_max": int(lens.max()),
        "token_mismatches": mismatch,
        "overlap_token_mismatches": ov_mismatch,
        "mismatches_verified_tie_flips": len(flip_reports),
        "tie_flip_gap_vs_thresh_max": (round(max(r["gap_vs_thresh"]
                                                 for r in flip_reports), 2)
                                       if flip_reports else 0.0),
    }


def _cb_bench(params, arch, args) -> None:
    """Standalone --serve-cb mode: one JSON line from _cb_measure."""
    rows = _cb_measure(params, arch, args, args.tokens)
    print(json.dumps({
        "metric": f"whisper-{args.model}-{args.quant} continuous-batching "
                  f"RTFx ({args.batch * 4} ragged reqs, {args.batch} slots, "
                  f"chunk {args.cb_chunk}, lognormal budgets<= "
                  f"{args.tokens} tok, "
                  + (f"transfer={args.transfer}, " if args.cb_upload
                     else "device-staged audio, ")
                  + f"audio={AVG_UTT_SECONDS}s/utt)",
        "value": rows["cb_rtfx"],
        "unit": "x_realtime",
        "vs_baseline": round(rows["cb_rtfx"] / BASELINE_RTFX, 2),
        "rows": rows,
    }))


def _stream_measure(params, arch, args, n_streams: int | None = None,
                    seconds: float | None = None,
                    churn: bool | None = None,
                    min_step_s: float = 1.0) -> dict:
    """Live-streaming throughput rows: N concurrent sessions through the
    StreamingPool's ONE batched decode per tick (streaming.py). Feeds
    each stream `seconds` of synthetic audio in 0.5 s chunks, round-robin,
    ticking after every feed round — the real-time serving pattern.
    Reports stream RTFx (audio ingested / wall) and the pool's
    occupancy/decode/draft stats."""
    import jax
    import jax.numpy as jnp  # noqa: F401 (backend init before pool build)

    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.evaluation.tokenizer import default_tokenizer
    from openai_whisper_compression_tpu.streaming import StreamingPool

    n_streams = n_streams or args.streams
    seconds = seconds if seconds is not None else args.stream_seconds
    churn = args.stream_churn if churn is None else churn
    cfg = DecodeConfig(max_new_tokens=args.tokens, notimestamps=False,
                       kv_int8=args.kv_int8,
                       cross_kv_int8=args.cross_kv_int8,
                       cross_kv_int4=args.cross_kv_int4)
    tok = default_tokenizer(arch)
    # decode cadence: the tick is ENCODE-bound (the 30 s window encoder
    # measured ~288 ms at B=32, nearly flat in batch — see DESIGN §8), so
    # aggregate throughput scales ~linearly with min_step_s at a
    # proportional commitment-latency cost; rows label their cadence
    pool = StreamingPool(params, arch, tok, cfg, max_streams=n_streams,
                         agreement=2, min_step_s=min_step_s)
    rng = np.random.default_rng(0)
    chunk = int(0.5 * 16000)
    total_chunks = int(seconds / 0.5)
    audio = [rng.standard_normal(
        (total_chunks, chunk)).astype(np.float32) * 0.1
        for _ in range(n_streams)]
    # warmup on a throwaway session: feed past min_step so the tick
    # actually decodes and compiles the shared batched program
    # (remote-TPU compiles take minutes)
    t0 = time.perf_counter()
    pool.open("warm")
    pool.feed("warm", rng.standard_normal((2 * chunk,)
                                          ).astype(np.float32) * 0.1)
    pool.tick()
    pool.close("warm")
    pool.reset_stats()                       # exclude warmup/compile
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s",
          file=sys.stderr)

    # churn: sessions leave and join mid-run (the production pattern —
    # callers hang up, new callers arrive). Every quarter of the run,
    # close 1/4 of the live sessions (collecting their finals) and open
    # fresh ones in their slots (VERDICT r2 next-step #7).
    churn_every = (total_chunks // 4 if churn else 0)
    next_id = n_streams
    live = list(range(n_streams))
    for i in live:
        pool.open(i)
    tick_times = []
    closed = 0
    t0 = time.perf_counter()
    for c in range(total_chunks):
        if churn_every and c > 0 and c % churn_every == 0:
            for _ in range(max(1, n_streams // 4)):
                sid = live.pop(0)
                pool.close(sid)       # flush decodes ride the shared step
                closed += 1
                pool.open(next_id)
                live.append(next_id)
                next_id += 1
        for i in live:
            pool.feed(i, audio[i % n_streams][c])
        tt = time.perf_counter()
        pool.tick()
        tick_times.append(time.perf_counter() - tt)
    for i in live:
        pool.close(i)
        closed += 1
    wall = time.perf_counter() - t0
    stats = pool.stats()
    fed_s = total_chunks * 0.5        # audio actually fed, not the arg
    audio_s = stats["audio_seconds"] if stats.get("audio_seconds") \
        else n_streams * fed_s
    rtfx = audio_s / wall
    p50 = float(np.percentile(tick_times, 50)) * 1e3
    p95 = float(np.percentile(tick_times, 95)) * 1e3
    print(f"# stream stats: {stats}", file=sys.stderr)
    print(f"# tick latency p50={p50:.0f}ms p95={p95:.0f}ms "
          f"sessions_closed={closed} (churn "
          f"{'on' if churn_every else 'off'})", file=sys.stderr)
    acc = (stats["draft_accepted"] / stats["draft_proposed"]
           if stats.get("draft_proposed") else 0.0)
    return {"aggregate_rtfx": round(rtfx, 2),
            "sessions": n_streams, "seconds_per_stream": fed_s,
            "min_step_s": min_step_s,
            "churn": bool(churn_every),
            "occupancy": round(stats["mean_batch_occupancy"], 3),
            "device_rtfx": round(stats["rtfx"], 2),
            "tick_p50_ms": round(p50), "tick_p95_ms": round(p95),
            "draft_accept_rate": round(acc, 3),
            "sessions_closed": closed}


def _stream_bench(params, arch, args) -> None:
    rows = _stream_measure(params, arch, args)
    print(json.dumps({
        "metric": f"whisper-{args.model}-{args.quant} streaming RTFx "
                  f"({rows['sessions']} live streams"
                  f"{', churn' if rows['churn'] else ''}, LocalAgreement-2, "
                  f"{rows['seconds_per_stream']:.1f}s/stream, 0.5s chunks, "
                  f"tick p50={rows['tick_p50_ms']}ms "
                  f"p95={rows['tick_p95_ms']}ms)",
        "value": rows["aggregate_rtfx"],
        "unit": "x_realtime",
        "vs_baseline": round(rows["aggregate_rtfx"] / BASELINE_RTFX, 2),
        "rows": rows,
    }))


def _measure_pipelined(fn, params, wavs, args, n_iters) -> tuple[float, float]:
    """(rtfx, effective ms/batch) with `--pipeline` batches in flight:
    host RTT and readback overlap device compute — steady-state serving
    accounting (reference `evaluation.py:103-106` divides summed time by
    summed audio)."""
    import numpy as np

    depth = max(args.pipeline, 1)
    n = max(n_iters, 8)
    t0 = time.perf_counter()
    inflight = []
    for i in range(n):
        inflight.append(fn(params, wavs[i % len(wavs)])[0])
        if len(inflight) >= depth:
            np.asarray(inflight.pop(0))
    for tok in inflight:
        np.asarray(tok)
    wall_total = time.perf_counter() - t0
    rtfx = n * args.batch * AVG_UTT_SECONDS / wall_total
    return rtfx, wall_total / n * 1e3


def _measure_fenced(fn, params, wavs, args, n_iters):
    """(rtfx, times list, final lengths) with a host-readback fence per
    batch — per-batch latency accounting (the r1/r2-early BENCH metric)."""
    times = []
    lengths = None
    for i in range(n_iters):
        wav = wavs[i % len(wavs)]
        t0 = time.perf_counter()
        tokens, lengths = fn(params, wav)
        np.asarray(tokens)
        times.append(time.perf_counter() - t0)
    wall = float(np.median(times))
    return args.batch * AVG_UTT_SECONDS / wall, times, lengths


def _craft_ts_embeddings(params, arch, probe_mels, peak: float = 1.4
                         ) -> object:
    """Return params with the timestamp-band token embeddings crafted so a
    random-weight model's closing timestamps land DEEP in the window and
    vary with the audio (the longform analog of test_continuous.py's
    crafted-EOT fixture; VERDICT r3 next-step #5). `peak`: the parabola's
    linear coefficient a (preferred closing index k* ≈ K·a/2)."""
    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.models import decode as D, whisper

    ts_begin = arch.no_timestamps_token_id + 1
    k_band = arch.vocab_size - ts_begin
    prefix = D.forced_prefix(arch, DecodeConfig(notimestamps=False))
    enc = jax.jit(lambda p, m: whisper.encode(p, arch, m))(params,
                                                           probe_mels)
    dl = jax.jit(lambda p, t, e: whisper.decode_logits(p, arch, t, e))
    # probe 1: the text-forced position after the initial timestamp — its
    # argmax is the dominant text token the decode will actually emit
    ids0 = jnp.asarray([prefix + [ts_begin + 1]] * probe_mels.shape[0],
                       jnp.int32)
    text = np.arange(ts_begin)          # sub-timestamp ids
    A0 = np.asarray(dl(params, ids0, enc)[:, -1].astype(jnp.float32))[:,
                                                                      text]
    dom0 = int(np.bincount(A0.argmax(axis=1)).argmax())
    # probe 2: the CLOSING decision position [prefix, ts, text] — the
    # context whose hidden state actually scores the crafted band
    ids = jnp.asarray([prefix + [ts_begin + 1, dom0]]
                      * probe_mels.shape[0], jnp.int32)
    logits = np.asarray(dl(params, ids, enc)[:, -1].astype(jnp.float32))
    A = logits[:, text]
    dom = int(np.bincount(A.argmax(axis=1)).argmax())
    emb = params["decoder"]["embed"]
    from openai_whisper_compression_tpu.ops.qtensor import QTensor, dequantize
    if isinstance(emb, QTensor):                # int8 runs quantize embed
        emb = dequantize(emb, jnp.bfloat16)
    E = np.array(emb.astype(jnp.float32))
    # Parabola anchored on the dom token's own direction (its logit L is
    # positive at every closing position — dom IS the emitted text):
    #   logit(ts_k) = L·(1 + a(k/K) − b(k/K)²)
    # → preferred closing index k* ≈ K·a/2b, deep in the window. The
    # AUDIO DEPENDENCE is the model's own: which exact band index wins at
    # each closing position rides the utterance's cross-attention response
    # (measured: per-stream closing times spread ~±10% around k* — real
    # hidden-state variation, not injected noise). Explicit linear
    # audio-readout terms were tried and rejected: any direction with
    # enough gain to move the peak also drifts at contexts the probe
    # never saw, saturating the band edge.
    kk = (np.arange(k_band, dtype=np.float32) / k_band)[:, None]
    a, b = peak, 1.0
    E[ts_begin:] = E[dom][None] * (1.0 + a * kk - b * kk * kk)
    new = dict(params)
    new["decoder"] = dict(params["decoder"])
    new["decoder"]["embed"] = jnp.asarray(E, jnp.bfloat16)
    return new


def _longform_row(params, arch, args) -> dict:
    """Multi-stream timestamp-seek long-form row: N concurrent 60 s streams
    through transcribe_seek_batch's ONE fixed-batch window decoder
    (longform.py) — the workload the reference's 30 s-only harness cannot
    express. Audio seconds here are REAL (60 s/stream), not the
    AVG_UTT_SECONDS convention.

    The timestamp-band embeddings are CRAFTED (see _craft_ts_embeddings)
    so seek advances are audio-dependent and non-degenerate on random
    weights — every window then transcribes fresh audio, as with real
    checkpoints, and stream rtfx is a meaningful throughput number rather
    than a fixed-tiny-hop artifact."""
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.evaluation.longform import (
        transcribe_seek_batch)
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        default_tokenizer)

    # variable stream lengths (45-75 s, mean 60): with audio-dependent
    # advances the per-stream window counts then genuinely differ — the r4
    # row's uniform 60 s streams all landed on the same count, making the
    # "audio-dependent seek" claim invisible in the artifact (VERDICT r4
    # #5); audio seconds are accounted from the REAL lengths
    n_streams = 32
    cfg = DecodeConfig(max_new_tokens=args.tokens, notimestamps=False,
                       kv_int8=args.kv_int8,
                       cross_kv_int8=args.cross_kv_int8,
                       cross_kv_int4=args.cross_kv_int4)
    tok = default_tokenizer(arch)
    rng = np.random.default_rng(3)
    lens_s = rng.uniform(45.0, 75.0, n_streams)
    wavs = [rng.standard_normal(int(s * 16000)).astype(np.float32) * 0.1
            for s in lens_s]
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.audio import features
    from openai_whisper_compression_tpu.evaluation.harness import (
        samples_for_arch)

    n_probe = samples_for_arch(arch)
    probe = jnp.asarray(np.stack([
        np.pad(w[:n_probe], (0, max(0, n_probe - len(w)))) for w in wavs[:8]]))
    probe_mels = features.preprocess(probe, arch.num_mel_bins,
                                     length=n_probe)
    lf_params = _craft_ts_embeddings(params, arch, probe_mels)
    # cold call compiles the window decoder + the pool-shaped cut program
    # and pays the first-content staging upload; the recorded number is
    # the STEADY-STATE second call (cold wall recorded alongside) — the
    # serving shape, where the compiled programs outlive one batch of
    # files. Audio stages as PCM16 (bit-exact for 16-bit-sourced audio).
    t0 = time.perf_counter()
    transcribe_seek_batch(lf_params, arch, wavs, tok, cfg,
                          batch_size=n_streams, stage_int16=True)
    cold_wall = time.perf_counter() - t0
    print(f"# longform cold (compiles + first staging) {cold_wall:.1f}s",
          file=sys.stderr)
    t0 = time.perf_counter()
    results = transcribe_seek_batch(lf_params, arch, wavs, tok, cfg,
                                    batch_size=n_streams, stage_int16=True)
    wall = time.perf_counter() - t0
    windows = sum(r["num_windows"] for r in results)
    segments = sum(len(r["segments"]) for r in results)
    advances = [ln / max(r["num_windows"], 1)
                for ln, r in zip(lens_s, results)]
    audio_s = float(np.sum(lens_s))
    return {"rtfx": round(audio_s / wall, 2),
            "window_rtfx": round(windows * 30.0 / wall, 2),
            "windows": windows, "segments": segments,
            "mean_advance_s": round(float(np.mean(advances)), 2),
            "advance_std_s": round(float(np.std(advances)), 2),
            "distinct_window_counts": len({r["num_windows"]
                                           for r in results}),
            "streams": n_streams,
            "stream_seconds": [round(float(s), 1) for s in lens_s[:8]],
            "mean_stream_s": round(float(np.mean(lens_s)), 1),
            "crafted_ts": True, "stage_int16": True,
            "wall_s": round(wall, 2),
            "cold_wall_s": round(cold_wall, 2)}


def _presets_bench(args) -> None:
    """Flagship preset throughput ladder (VERDICT r4 next-step #7).

    One pipelined-RTFx row per preset so cross-round regressions in the
    big-model decode paths (kv_int8 layout, int4 weights, structured
    surgery, the turbo 4-layer decoder) are machine-checkable instead of
    living in DESIGN.md prose. Mirrors the reference's 13-config sweep
    table role (`quantization.py:42-90`) at the throughput level. Emits
    incrementally like the default composite; intended to be committed as
    artifacts/presets.json."""
    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.evaluation.harness import (
        make_transcribe_fn)
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.models.fuse import fuse_qkv
    from openai_whisper_compression_tpu.quant import api as quant_api

    # batch per preset: the measured-fastest config for each model on one
    # v5e chip (DESIGN.md §8: small b96; large-v3 b48 > b64; medium b64)
    specs = [
        ("small_int8", "small", 96, "int8",
         dict(kv_int8=True, cross_kv_int8=True), False),
        ("medium_int4_kv8", "medium", 64, "int4",
         dict(kv_int8=True, cross_kv_int8=True), False),
        ("largev3_s50_int8_ckv4", "large-v3", 48, "int8",
         dict(kv_int8=True, cross_kv_int4=True, cross_kv_int8=False), True),
        ("turbo_int8", "large-v3-turbo", 64, "int8",
         dict(kv_int8=True, cross_kv_int8=True), False),
    ]
    art = Artifact(budget_s=max(args.budget_s, 2400.0))
    art.install_handlers()
    rng = np.random.default_rng(0)

    def one(name, model, batch, quant, cfg_kw, structured50):
        arch = ARCHS[model]
        params = P.init_params_jit(arch, jax.random.PRNGKey(0),
                                   dtype=jnp.bfloat16)
        if structured50:
            from openai_whisper_compression_tpu.prune.structured import (
                prune_heads_by_l1, shrink_ffn)

            params = prune_heads_by_l1(params, arch, 0.5, physical=True)
            for comp in ("encoder", "decoder"):
                for li in range(len(params[comp]["layers"])):
                    params = shrink_ffn(params, comp, li, 0.5)
        params = quant_api.quantize_params(params, method=quant)
        params = fuse_qkv(params)
        cfg = DecodeConfig(max_new_tokens=args.tokens,
                           suppress_tokens=(arch.eos_token_id,), **cfg_kw)
        fn = make_transcribe_fn(arch, cfg, fast_mel=True,
                                fast_gelu=args.fast_gelu)
        import copy as _copy

        pargs = _copy.copy(args)
        pargs.batch = batch
        wavs = [jax.jit(lambda k, b=batch: jax.random.normal(
            k, (b, 480_000), jnp.float32) * 0.1)(jax.random.PRNGKey(i))
            for i in range(2)]
        t0 = time.perf_counter()
        np.asarray(fn(params, wavs[0])[0])
        compile_s = time.perf_counter() - t0
        rtfx, ms_batch = _measure_pipelined(fn, params, wavs, pargs,
                                            args.iters)
        row = {"rtfx": round(rtfx, 2), "ms_per_batch": round(ms_batch, 1),
               "batch": batch, "quant": quant, "model": model,
               "params_mb": round(P.size_in_mb(params), 1),
               "compile_s": round(compile_s, 1), **cfg_kw}
        if structured50:
            row["structured50"] = True
        if name == "small_int8":
            art.set_headline(
                f"preset ladder RTFx (headline=small_int8 b96, "
                f"{args.tokens} tok, audio={AVG_UTT_SECONDS}s/utt)",
                round(rtfx, 2), "x_realtime")
        return row

    for (name, model, batch, quant, cfg_kw, s50) in specs:
        art.run_row(name, lambda n=name, m=model, b=batch, q=quant,
                    ck=cfg_kw, s=s50: one(n, m, b, q, ck, s), est_s=420)
    art.rows["total_wall_s"] = round(art.elapsed(), 1)
    art.emit()


def _kernel_smoke() -> None:
    """Edge-shape parity for every Pallas quant kernel on the attached
    backend: K/N off the 128/256 grid exercise Mosaic padding paths that the
    model's aligned shapes never hit (VERDICT r1: 'odd K, N%128!=0')."""
    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.ops.qtensor import (
        _effective_block_scale, dequantize)
    from openai_whisper_compression_tpu.ops import quant_matmul as QM
    from openai_whisper_compression_tpu.quant import core as qcore

    rng = np.random.default_rng(0)
    checks = []

    def parity(name, out, q, x, tol=2e-2):
        ref = x @ dequantize(q, jnp.float32)
        err = float(jnp.max(jnp.abs(out - ref))
                    / (jnp.max(jnp.abs(ref)) + 1e-9))
        checks.append((name, err))
        assert err < tol, (name, err)

    # int8: K, N both off-grid
    for (m, k, n) in ((7, 100, 1000), (33, 250, 333)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        q = qcore.quantize_int8(w)
        parity(f"int8 {m}x{k}x{n}",
               QM.int8_matmul_pallas(x, q.data, q.scale), q, x)
    # int4: even K off the 256 grid (K/2 % 128 != 0 -> pad path)
    for (m, k, n) in ((5, 250, 333), (17, 762, 1000)):
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        q = qcore.quantize_int_sub8(w, bits=4)
        parity(f"int4 {m}x{k}x{n}",
               QM.int4_matmul_pallas(x, q.data, q.scale, q.in_dim), q, x,
               tol=5e-2)
    # nf4/fp4/hqq blockwise: K must satisfy blockwise4_pallas_ok; N off-grid
    for kind in ("nf4", "fp4"):
        k, n, m = 512, 1000, 9
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        q = qcore.quantize_nf4(w, kind=kind, block_size=64, double_quant=True)
        assert QM.blockwise4_pallas_ok(k, 64)
        s = _effective_block_scale(q, jnp.float32)
        parity(f"{kind} {m}x{k}x{n}",
               QM.nf4_matmul_pallas(x, q.data, s, kind, k, 64), q, x,
               tol=5e-2)
    for bits in (4, 8):
        k, n, m = 512, 1000, 9
        w = jnp.asarray(rng.normal(size=(k, n)).astype(np.float32) * 0.02)
        x = jnp.asarray(rng.normal(size=(m, k)).astype(np.float32))
        q = qcore.quantize_hqq(w, bits=bits, group_size=64)
        parity(f"hqq{bits} {m}x{k}x{n}",
               QM.group_asym_matmul_pallas(x, q.data, q.scale, q.zero,
                                           q.in_dim, q.block_size), q, x,
               tol=5e-2)
    # the gate must REJECT K off the 256 grid (XLA fallback, not a crash)
    assert not QM.blockwise4_pallas_ok(384, 64)

    # fused decode-attention kernels at f32 / large-bh shapes: these busted
    # the 16 MB scoped-VMEM limit before the _fit_block_g lane-padding fix
    # (whisper-small B=128: 18.04 / 24.00 MB) — compiling them here keeps
    # the block-budget calibration honest against real Mosaic accounting.
    # TPU-only: interpret mode can't see scoped VMEM and takes minutes at
    # these shapes.
    from openai_whisper_compression_tpu.ops.cross_attention import (
        decode_cross_attention_grouped)
    from openai_whisper_compression_tpu.ops.self_attention_step import (
        decode_self_attention_update)

    on_tpu = jax.default_backend() in ("tpu", "axon")
    for dt, tag in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")) if on_tpu \
            else ():
        bh, s, dh = 1536, 64, 64
        q = jnp.asarray(rng.normal(size=(bh, dh)), dt)
        kc = jnp.zeros((bh, s, dh), dt)
        vc = jnp.zeros((bh, s, dh), dt)  # distinct: caches are donated
        out, _, _ = decode_self_attention_update(
            q, q, q, kc, vc, jnp.int32(3))
        assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))
        checks.append((f"self-attn-update {tag} bh={bh}", 0.0))
        kt = jnp.asarray(rng.normal(size=(bh, dh, 1536)) * 0.1, dt)
        o = decode_cross_attention_grouped(q[:, None, :], kt, kt,
                                           s_valid=1500)
        assert bool(jnp.all(jnp.isfinite(o.astype(jnp.float32))))
        checks.append((f"cross-attn-grouped {tag} bh={bh}", 0.0))

    for name, err in checks:
        print(f"# {name}: rel_err={err:.2e}", file=sys.stderr)
    print(json.dumps({"metric": "pallas kernel edge-shape smoke",
                      "value": len(checks), "unit": "shapes_passed",
                      "vs_baseline": 1.0}))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="small")
    # 96 measured fastest on v5e (5.61 ms/utt vs 6.31 at 64): fixed per-call
    # costs amortize with batch while XLA's encoder-attention fusion still
    # holds (it collapses at B=128 — see models.whisper.attention; the
    # Pallas fallback there keeps B>=128 linear but XLA-fused B=96 wins)
    ap.add_argument("--batch", type=int, default=96)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--tokens", type=int, default=25)
    ap.add_argument("--beam", type=int, default=1)
    ap.add_argument("--quant", default="int8",
                    choices=["none", "int8", "int4", "nf4", "nf4_dq", "fp4",
                             "hqq_int3", "hqq_int4", "hqq_int8"])
    ap.add_argument("--serve", action="store_true",
                    help="steady-state throughput through the "
                         "dynamic-batching TranscriptionService")
    ap.add_argument("--transfer", default="int16",
                    choices=["float32", "int16", "mulaw"],
                    help="--serve wire codec for host->device audio "
                         "(mulaw = 1 B/sample, ~38 dB SNR)")
    ap.add_argument("--arrival-rtfx", type=float, default=None,
                    help="--serve open-loop mode: pace request arrivals at "
                         "this aggregate x-realtime load so latency "
                         "percentiles measure steady-state service time, "
                         "not burst-queue depth (default: closed-loop "
                         "burst, the max-throughput accounting)")
    ap.add_argument("--serve-pipeline", type=int, default=2,
                    help="--serve batches in flight (async dispatch "
                         "overlaps host prep/wire with device compute; "
                         "1 = fenced, the pre-r3 serving accounting)")
    ap.add_argument("--wire", default="float32",
                    choices=["float32", "flac"],
                    help="--serve client->service request format (flac = "
                         "lossless ~2x smaller payload, decoded in the "
                         "native loader's worker pool)")
    ap.add_argument("--serve-cb", action="store_true",
                    help="continuous-batching serve bench: slot-recycling "
                         "decode (continuous.py) vs batch-synchronous waves "
                         "on one crafted-ragged request set; asserts token "
                         "equality between the two schedulers")
    ap.add_argument("--cb-chunk", type=int, default=8,
                    help="--serve-cb decode steps between host "
                         "retire/admit passes (readback cadence)")
    ap.add_argument("--cb-lanes", type=int, default=None,
                    help="--serve-cb admit lanes per pass (default "
                         "batch//8; wider = fewer dispatches, costlier "
                         "encoder per pass)")
    ap.add_argument("--cb-upload", action="store_true",
                    help="--serve-cb: per-admit host audio uploads in the "
                         "wall (default stages the request pool on-device "
                         "first — both schedulers pay the wire identically, "
                         "so staging isolates the scheduling difference)")
    ap.add_argument("--stream", action="store_true",
                    help="live-streaming throughput: N sessions through "
                         "the StreamingPool's batched per-tick decode")
    ap.add_argument("--streams", type=int, default=8,
                    help="concurrent live sessions for --stream")
    ap.add_argument("--stream-seconds", type=float, default=20.0,
                    help="audio seconds fed per stream for --stream")
    ap.add_argument("--stream-churn", action="store_true",
                    help="--stream with sessions leaving/joining mid-run "
                         "(1/4 of the pool every quarter of the run)")
    ap.add_argument("--tune-threshold", action="store_true",
                    help="measure the Pallas-vs-XLA dispatch crossover on "
                         "the attached chip and print it (feeds "
                         "ops.linear.PALLAS_M_TABLE)")
    ap.add_argument("--kernel-smoke", action="store_true",
                    help="Mosaic-grid edge-shape parity smoke for every "
                         "Pallas quant kernel (odd K, N%%128!=0) on the "
                         "attached backend")
    ap.add_argument("--pipeline", type=int, default=2, metavar="DEPTH",
                    help="keep DEPTH batches in flight (JAX async dispatch): "
                         "host RTT and readback overlap device compute — "
                         "steady-state throughput, the accounting a "
                         "production serving loop gets (measured: recovers "
                         "the ~28 ms/batch tunnel RTT, 537->509 ms "
                         "effective). 0 = fence every batch (the per-batch "
                         "latency accounting; r1/r2-early BENCH history)")
    ap.add_argument("--real-decode", action="store_true",
                    help="decode to EOT (no suppression, variable lengths, "
                         "early-exit while_loop) and report RTFx plus "
                         "p50/p95 per-batch latency — the reference's RTF "
                         "accounting shape (evaluation.py:77-106) instead "
                         "of the fixed-25-token regression metric")
    ap.add_argument("--budget-s", type=float, default=780.0,
                    help="wall-clock budget for the default composite "
                         "(measured from process start): rows that would "
                         "run past it are recorded as skipped-for-budget, "
                         "never silently dropped, and the artifact JSON "
                         "line is re-emitted after every row so the "
                         "driver's last-line parse always lands")
    ap.add_argument("--presets", action="store_true",
                    help="flagship preset ladder: one throughput row per "
                         "preset (small_int8, medium_int4_kv8, "
                         "largev3_s50_int8_ckv4, turbo_int8) so big-model "
                         "regressions are machine-checkable "
                         "(artifacts/presets.json)")
    ap.add_argument("--quick", action="store_true",
                    help="headline (pipelined + fenced) only — skip the "
                         "real-decode and longform rows of the default "
                         "composite")
    ap.add_argument("--w8a8", action="store_true",
                    help="dynamic int8 activations via the fused Pallas "
                         "w8a8 kernel (the reference's PTDQ analog, "
                         "model_utils.py:131-134 — accuracy-changing, so "
                         "opt-in; measured 3.8x the bf16 matmul rate)")
    ap.add_argument("--fuse", action=argparse.BooleanOptionalAction,
                    default=True, help="fuse decoder qkv projections")
    ap.add_argument("--kv-int8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="int8 self-attn KV cache (default ON since r5: "
                         "lane-major scales made it a wash-or-win at every "
                         "measured config — small b96 1410 vs 1399, "
                         "large-v3 b48 346.7 vs 346.6 — and it halves the "
                         "self-KV HBM footprint)")
    ap.add_argument("--cross-kv-int8", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="int8 cross-attn K/V (dequant fused into the Pallas "
                         "decode kernel; measured 535->490 ms/batch)")
    ap.add_argument("--cross-kv-int4", action="store_true",
                    help="int4 cross-attn K/V: halves HBM *capacity* (peak "
                         "2403->1539 MB at B=64) but ~7%% slower than int8 "
                         "(432 vs 404 ms/batch; convert-cost floor, "
                         "DESIGN.md §8); memory knob only")
    ap.add_argument("--structured50", action="store_true",
                    help="50%% structured head+FFN pruning before quant")
    ap.add_argument("--merge-at", type=int, default=None,
                    help="encoder adjacent-token merging before this layer")
    ap.add_argument("--cross-kv-pool", type=int, default=1,
                    help="mean-pool encoder frames (stride) before cross-KV "
                         "only — halves the per-step decode cross-attention "
                         "stream at stride 2 without touching encoder "
                         "fidelity (lossy; models/merge.py)")
    ap.add_argument("--cross-kv-merge", type=int, default=0,
                    help="ToMe-style bipartite merge of this many encoder "
                         "frame pairs before cross-KV (content-adaptive "
                         "lossy token merging; models/merge.py)")
    ap.add_argument("--fast-gelu", action=argparse.BooleanOptionalAction,
                    default=True,
                    help="tanh-approximate encoder GELU; its ~3e-3 activation "
                         "delta is below the bf16 rounding floor the model "
                         "already runs at (490->445 ms/batch)")
    args = ap.parse_args()

    import os

    import jax
    import jax.numpy as jnp

    # honor JAX_PLATFORMS even when a site hook force-registered another
    # backend (same guard as cli.py — lets `JAX_PLATFORMS=cpu python
    # bench.py --model test2l-ts --stream` smoke off-chip)
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    # persistent compile cache: first bench process pays the 2-4 min
    # compile, every later one seconds (measured 35.4 -> 4.1 s on the
    # batch-8 encoder through the tunnel)
    from openai_whisper_compression_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    enable_persistent_compilation_cache()

    # Fail fast on a TPU-tunnel outage: backend init otherwise blocks
    # ~15-20 min before erroring UNAVAILABLE (observed 2026-08-17). The
    # probe shares the process's backend, so a success costs nothing.
    import threading

    ready = [False]

    def _probe():
        try:
            ready[0] = len(jax.devices()) > 0
        except Exception:
            ready[0] = False

    t = threading.Thread(target=_probe, daemon=True)
    t.start()
    t.join(300.0)
    if not ready[0]:
        print("# TPU backend unavailable (tunnel outage) — bench aborted; "
              "see BENCH_r*.json history for last recorded numbers",
              file=sys.stderr)
        sys.exit(3)

    if args.tune_threshold:
        from openai_whisper_compression_tpu.ops import linear as L

        best = L.measure_pallas_crossover()
        kind = jax.devices()[0].device_kind
        print(json.dumps({"metric": f"pallas_m_threshold ({kind})",
                          "value": best, "unit": "rows",
                          "vs_baseline": best / L.PALLAS_M_DEFAULT}))
        return
    if args.kernel_smoke:
        _kernel_smoke()
        return
    if args.presets:
        _presets_bench(args)
        return

    from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
    from openai_whisper_compression_tpu.evaluation.harness import make_transcribe_fn
    from openai_whisper_compression_tpu.evaluation.memory import device_memory_stats
    from openai_whisper_compression_tpu.models import params as P

    arch = ARCHS[args.model]
    params = P.init_params_jit(arch, jax.random.PRNGKey(0), dtype=jnp.bfloat16)
    if args.structured50:
        from openai_whisper_compression_tpu.prune.structured import (
            prune_heads_by_l1, shrink_ffn)

        params = prune_heads_by_l1(params, arch, 0.5, physical=True)
        for comp in ("encoder", "decoder"):
            for li in range(len(params[comp]["layers"])):
                params = shrink_ffn(params, comp, li, 0.5)
    if args.quant != "none":
        from openai_whisper_compression_tpu.quant import api as quant_api

        params = quant_api.quantize_params(
            params, method=args.quant,
            act="dynamic_int8" if args.w8a8 else None)
    if args.fuse:
        from openai_whisper_compression_tpu.models.fuse import fuse_qkv

        params = fuse_qkv(params)
    print(f"# model={args.model} quant={args.quant} "
          f"params_mb={P.size_in_mb(params):.1f} backend={jax.default_backend()}",
          file=sys.stderr)

    if args.stream:
        _stream_bench(params, arch, args)
        return
    if args.serve_cb:
        _cb_bench(params, arch, args)
        return

    # fixed-25 regression metric suppresses EOT so every run does identical
    # work; --real-decode lets EOT through and exercises the early-exit path
    cfg = DecodeConfig(max_new_tokens=args.tokens, beam_size=args.beam,
                       kv_int8=args.kv_int8,
                       cross_kv_int8=args.cross_kv_int8,
                       cross_kv_int4=args.cross_kv_int4,
                       cross_kv_pool=args.cross_kv_pool,
                       cross_kv_merge=args.cross_kv_merge,
                       suppress_tokens=(() if args.real_decode
                                        else (arch.eos_token_id,)))
    fn = make_transcribe_fn(arch, cfg, fast_mel=True, merge_at=args.merge_at,
                            fast_gelu=args.fast_gelu)

    if args.serve:
        _serve_bench(params, arch, cfg, fn, args)
        return

    # decode-path audio generated ON-DEVICE: zero host->device upload, so
    # the headline measures identically even when the tunnel's
    # fresh-content bandwidth collapses (measured 1.4 GB/s -> 1 MB/s in
    # one session; serve/streaming keep their host wire — that IS their
    # workload)
    n_iters = max(args.iters, 8) if args.real_decode else args.iters
    _gen = jax.jit(lambda k: jax.random.normal(
        k, (args.batch, 480_000), jnp.float32) * 0.1)
    wavs = [_gen(jax.random.PRNGKey(i))
            for i in range(max(n_iters if args.real_decode else 1, 2))]

    # compile + warmup. Host readback (np.asarray of the tiny token array)
    # is the only reliable fence on axon: block_until_ready can return
    # before execution finishes for buffers descended from jit-created
    # params; ONE readback — each extra np.asarray pays ~25 ms tunnel RTT.
    t0 = time.perf_counter()
    np.asarray(fn(params, wavs[0])[0])
    print(f"# compile+warmup {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    hbm = device_memory_stats().get("hbm_peak_mb", 0.0)
    if not hbm:  # axon reports no memory stats: analytic steady-state model
        from openai_whisper_compression_tpu.evaluation.memory import analytic_hbm_mb

        ckv_bytes = (0.5 if cfg.cross_kv_int4
                     else 1.0 if cfg.cross_kv_int8 else 2.0)
        s_full = arch.max_source_positions
        cross_s = (s_full - cfg.cross_kv_merge if cfg.cross_kv_merge
                   else -(-s_full // cfg.cross_kv_pool))
        hbm = analytic_hbm_mb(params, arch, args.batch,
                              beam=max(args.beam, 1), kv_int8=cfg.kv_int8,
                              cross_kv_bytes=ckv_bytes, cache_len=64,
                              cross_s=cross_s)

    mode = "greedy" if args.beam <= 1 else f"beam{args.beam}"
    if args.merge_at is not None:
        mode += f"+merge@{args.merge_at}"
    if cfg.cross_kv_merge:
        mode += f"+tome{cfg.cross_kv_merge}"
    elif cfg.cross_kv_pool > 1:
        mode += f"+ckvpool{cfg.cross_kv_pool}"

    if args.real_decode:
        # standalone real-decode mode (the r2 flag): fenced, to-EOT
        rtfx, times, lengths = _measure_fenced(fn, params, wavs, args,
                                               n_iters)
        p50 = float(np.percentile(times, 50)) * 1e3
        p95 = float(np.percentile(times, 95)) * 1e3
        mean_len = float(np.mean(np.asarray(lengths)))
        print(f"# real-decode: mean_len={mean_len:.1f} tok "
              f"latency p50={p50:.0f}ms p95={p95:.0f}ms "
              f"(per batch of {args.batch}; every utterance in a batch "
              f"shares its batch's wall)", file=sys.stderr)
        print(json.dumps({
            "metric": f"whisper-{args.model}-{args.quant} real-decode RTFx "
                      f"(batch {args.batch}, to-EOT, audio=7.42s/utt, "
                      f"p50={p50:.0f}ms, p95={p95:.0f}ms)",
            "value": round(rtfx, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtfx / BASELINE_RTFX, 2),
        }))
        return

    if not args.pipeline:
        # fenced-only mode (--pipeline 0): the r1/r2-early accounting
        rtfx, times, _ = _measure_fenced(fn, params, wavs, args, n_iters)
        print(f"# wall_per_batch={np.median(times) * 1e3:.1f}ms "
              f"times={[f'{t*1e3:.0f}' for t in times]} "
              f"peak_hbm={hbm:.0f}MB (analytic when platform reports none)",
              file=sys.stderr)
        print(json.dumps({
            "metric": f"whisper-{args.model}-{args.quant} {mode} RTFx "
                      f"(batch {args.batch}, {args.tokens} tok, "
                      f"audio={AVG_UTT_SECONDS}s/utt)",
            "value": round(rtfx, 2),
            "unit": "x_realtime",
            "vs_baseline": round(rtfx / BASELINE_RTFX, 2),
        }))
        return

    # ---- default composite: pipelined headline + the workload family ----
    # The artifact is emitted incrementally: one full JSON line after the
    # headline and after EVERY row, so the driver's last-line parse always
    # lands even if the run is cut short (VERDICT r4 next-step #1).
    art = Artifact(budget_s=args.budget_s)
    art.install_handlers()

    def _link_mbps() -> float:
        """Measured host->device upload bandwidth for FRESH content (the
        tunnel content-caches repeats). Rows whose wall includes uploads
        (serve batches, longform staging) swing with this — measured
        24 MB/s to 1.4 GB/s across one session — so every artifact
        carries the link state it was recorded under."""
        x = np.random.default_rng(int(time.time())).standard_normal(
            (8, 480_000)).astype(np.float32)
        t0 = time.perf_counter()
        jax.device_put(x).block_until_ready()
        return round(x.nbytes / 1e6 / (time.perf_counter() - t0), 1)

    art.rows["link_mbps_start"] = _link_mbps()
    print(f"# link {art.rows['link_mbps_start']} MB/s", file=sys.stderr)
    rtfx, ms_batch = _measure_pipelined(fn, params, wavs, args, args.iters)
    print(f"# pipelined: depth={args.pipeline} "
          f"{ms_batch:.1f}ms/batch effective peak_hbm={hbm:.0f}MB "
          f"(analytic when platform reports none)", file=sys.stderr)
    art.rows["pipelined"] = {"rtfx": round(rtfx, 2),
                             "ms_per_batch": round(ms_batch, 1),
                             "t_row_s": round(art.elapsed(), 1)}
    art.set_headline(
        f"whisper-{args.model}-{args.quant} {mode} pipelined RTFx "
        f"(batch {args.batch}, depth {args.pipeline}, "
        f"{args.tokens} tok, audio={AVG_UTT_SECONDS}s/utt)",
        round(rtfx, 2), "x_realtime")

    def _fenced_row():
        f_rtfx, f_times, _ = _measure_fenced(fn, params, wavs, args,
                                             max(args.iters, 3))
        return {"rtfx": round(f_rtfx, 2),
                "ms_per_batch": round(float(np.median(f_times)) * 1e3, 1)}

    art.run_row("fenced", _fenced_row, est_s=5)

    if not args.quick:
        import copy as _copy
        import dataclasses

        def _real_decode_row():
            # to-EOT, ragged lengths (its own program — EOT unsuppressed +
            # early-exit while_loop)
            cfg_rd = dataclasses.replace(cfg, suppress_tokens=())
            fn_rd = make_transcribe_fn(arch, cfg_rd, fast_mel=True,
                                       merge_at=args.merge_at,
                                       fast_gelu=args.fast_gelu)
            t0 = time.perf_counter()
            np.asarray(fn_rd(params, wavs[0])[0])
            print(f"# real-decode compile+warmup "
                  f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
            rd_rtfx, rd_times, rd_lengths = _measure_fenced(
                fn_rd, params, wavs, args, max(args.iters, 8))
            f_rtfx = art.rows.get("fenced", {}).get("rtfx", rtfx)
            return {
                "rtfx": round(rd_rtfx, 2),
                "p50_ms": round(float(np.percentile(rd_times, 50)) * 1e3),
                "p95_ms": round(float(np.percentile(rd_times, 95)) * 1e3),
                "mean_len_tok": round(float(np.mean(np.asarray(rd_lengths))),
                                      1),
                "vs_fixed_token": round(rd_rtfx / f_rtfx, 3)}

        art.run_row("real_decode", _real_decode_row, est_s=45)

        if args.beam <= 1:
            # continuous-batching scheduler A/B on ragged budgeted requests
            # (fixed 64-token budget cap so the row is comparable across
            # rounds regardless of --tokens; lognormal<=64 matches
            # LibriSpeech's real transcript-length tail). Every token
            # mismatch between the schedulers must be PROVEN a bf16
            # tie-flip or the row errors.
            art.run_row("continuous_batching",
                        lambda: _cb_measure(params, arch, args, 64),
                        est_s=200)

            # streaming rows: steady state (32 sessions, 60 s streams, no
            # churn — the marginal-cost/streams-per-chip number) AND the
            # churn row (sessions leave/join; ramp + flush costs).
            # Both share one 32-wide pool program (VERDICT r4 #4).
            art.run_row("streaming_steady",
                        lambda: _stream_measure(params, arch, args,
                                                n_streams=32, seconds=60.0,
                                                churn=False),
                        est_s=150)
            # same compiled program, half the decode cadence: the
            # throughput end of the cadence/latency frontier (labeled)
            art.run_row("streaming_steady_2s",
                        lambda: _stream_measure(params, arch, args,
                                                n_streams=32, seconds=60.0,
                                                churn=False, min_step_s=2.0),
                        est_s=80)
            # churn on 30 s streams: long enough that the row measures
            # serving-with-churn rather than pure session ramp (the r4
            # 10 s-stream config measured mostly ramp; VERDICT r4 #5)
            art.run_row("streaming_churn",
                        lambda: _stream_measure(params, arch, args,
                                                n_streams=32, seconds=30.0,
                                                churn=True),
                        est_s=70)

        art.run_row("longform", lambda: _longform_row(params, arch, args),
                    est_s=70)

        if args.beam <= 1:
            # serving rows: closed-loop burst (max throughput) AND
            # open-loop paced arrivals (steady-state latency — the config
            # the README quotes must be the one recorded; VERDICT r4 #6).
            # Open-loop offers ~60% of the measured closed-loop capacity so
            # percentiles measure service latency, not marginal stability
            # (arrival 150x measured right AT capacity: queue never drains).
            sargs = _copy.copy(args)
            sargs.wire = "flac"          # the production wire shape
            art.run_row("serve",
                        lambda: _serve_measure(params, arch, cfg, fn, sargs,
                                               batch=32, n_req=128),
                        est_s=90)
            # 60x offered: the dynamic batcher's steady batch at this
            # arrival is ~5-8 requests, whose ~0.5 s service puts capacity
            # near 75x — offered load must sit below THAT (small-batch)
            # capacity, not below the full-batch burst capacity (100x and
            # 150x both measured queue-unstable with p50 > 2.5 s)
            oargs = _copy.copy(sargs)
            oargs.arrival_rtfx = 60.0
            art.run_row("serve_openloop",
                        lambda: _serve_measure(params, arch, cfg, fn, oargs,
                                               batch=32, n_req=96),
                        est_s=60)

        if (args.cross_kv_pool == 1 and not args.cross_kv_merge
                and args.beam <= 1):
            def _pool2_row():
                # opt-in lossy lever recorded alongside the lossless
                # headline: cross-KV token merging stride 2 (models/merge.py)
                cfg_p2 = dataclasses.replace(cfg, cross_kv_pool=2)
                fn_p2 = make_transcribe_fn(arch, cfg_p2, fast_mel=True,
                                           merge_at=args.merge_at,
                                           fast_gelu=args.fast_gelu)
                t0 = time.perf_counter()
                np.asarray(fn_p2(params, wavs[0])[0])
                print(f"# pool2 compile+warmup "
                      f"{time.perf_counter() - t0:.1f}s", file=sys.stderr)
                p2_rtfx, p2_ms = _measure_pipelined(fn_p2, params, wavs,
                                                    args, args.iters)
                return {"rtfx": round(p2_rtfx, 2),
                        "ms_per_batch": round(p2_ms, 1),
                        "vs_headline": round(p2_rtfx / rtfx, 3)}

            art.run_row("cross_kv_pool2_lossy", _pool2_row, est_s=45)

    art.rows["link_mbps_end"] = _link_mbps()
    art.rows["total_wall_s"] = round(art.elapsed(), 1)
    art.emit()


if __name__ == "__main__":
    main()
