"""Dynamic-batching transcription service (TPU serving loop).

The reference is a batch-evaluation research repo — it has no serving story
(SURVEY.md §0: script-shaped, `dataset.map` loops). A production TPU
deployment needs the opposite shape: a long-lived process with ONE compiled
program and a batcher in front of it. This module provides that:

- requests (`submit`) land in a queue; a worker thread assembles them into
  fixed-size batches (pad-to-`batch_size`, so the jitted transcribe fn
  compiles exactly once) using the native C++ `BatchLoader`
  (runtime/src/owc_runtime.cpp) for threaded resample/pad/trim;
- a batch launches when full or after `max_wait_ms`, whichever first
  (classic dynamic batching: latency bound under low load, throughput
  bound under high load);
- per-request futures deliver {"text", "tokens", "rtfx", ...}.

All TPU work stays on one thread (JAX programs are not re-entrant per
device); concurrency lives in the batcher and the native loader.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
import numpy as np

from .config import DecodeConfig, WhisperArch

_MU = 255.0  # G.711 u-law companding constant
_MULAW_LUT: np.ndarray | None = None  # int16 -> uint8 code table


def _mulaw_lut() -> np.ndarray:
    global _MULAW_LUT
    if _MULAW_LUT is None:
        x = np.arange(-32768, 32768, dtype=np.float32) / 32768.0
        y = np.sign(x) * np.log1p(_MU * np.abs(x)) / np.log1p(_MU)
        _MULAW_LUT = np.round((y + 1.0) * 127.5).astype(np.uint8)
    return _MULAW_LUT


def _pcm16(x: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> int16 PCM (the one quantization convention both
    wire codecs share — int16 sends these samples, u-law LUTs them)."""
    return np.clip(np.round(np.asarray(x) * 32768.0), -32768,
                   32767).astype(np.int16)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """float32 [-1, 1] -> uint8 u-law code (1 B/sample wire format).

    The classic G.711 shape: quantize to int16 PCM, then one table
    gather — ~5x the throughput of computing the log per sample, and the
    int16 intermediate loses nothing (u-law codes are far coarser)."""
    return _mulaw_lut()[_pcm16(x).astype(np.int32) + 32768]


def mulaw_decode(u):
    """uint8 u-law code -> float32 [-1, 1] (jnp; runs inside the jitted
    serving program so only 1 B/sample crosses the host-device link)."""
    import jax.numpy as jnp

    y = u.astype(jnp.float32) * (1.0 / 127.5) - 1.0
    return jnp.sign(y) * (jnp.power(1.0 + _MU, jnp.abs(y)) - 1.0) / _MU


class _FlacRequest:
    """A queued utterance still in FLAC form: the bytes travel to the
    native BatchLoader, which decodes them in its worker pool. `__len__`
    is the per-channel sample count so the worker's `len(wav)/sr`
    duration accounting works unchanged."""

    __slots__ = ("data", "samples")

    def __init__(self, data: bytes, samples: int):
        self.data = data
        self.samples = samples

    def __len__(self) -> int:
        return self.samples


@dataclass
class ServiceStats:
    requests: int = 0        # batch items processed (chunk windows count)
    user_requests: int = 0   # user-facing submissions (chunked = 1)
    batches: int = 0
    occupancy_sum: float = 0.0
    audio_seconds: float = 0.0
    busy_seconds: float = 0.0
    queue_peak: int = 0
    # submit->result latencies (seconds); ring-bounded like the reference's
    # 500-sample memory tracker (`memory_tracker.py:146`)
    latencies: list = field(default_factory=list, repr=False)
    _lock: threading.Lock = field(default_factory=threading.Lock, repr=False)

    MAX_LATENCIES = 10_000

    def snapshot(self) -> dict:
        with self._lock:
            mean_occ = (self.occupancy_sum / self.batches
                        if self.batches else 0.0)
            rtfx = (self.audio_seconds / self.busy_seconds
                    if self.busy_seconds else 0.0)
            lat = {}
            if self.latencies:
                import numpy as _np

                arr = _np.asarray(self.latencies)
                lat = {"latency_p50_ms": float(_np.percentile(arr, 50)) * 1e3,
                       "latency_p95_ms": float(_np.percentile(arr, 95)) * 1e3,
                       "latency_max_ms": float(arr.max()) * 1e3}
            return {
                "requests": self.requests,
                "user_requests": self.user_requests,
                "batches": self.batches,
                "mean_batch_occupancy": mean_occ,
                "audio_seconds": self.audio_seconds,
                "busy_seconds": self.busy_seconds,
                "rtfx": rtfx,
                "queue_peak": self.queue_peak,
                **lat,
            }


class TranscriptionService:
    """Dynamic-batching front end over a jitted transcribe function.

    params/arch: model to serve. tokenizer: .decode(ids)->str.
    batch_size: the compiled batch (pad-to-full). max_wait_ms: max time the
    first request in a batch waits for co-riders.
    """

    def __init__(self, params, arch: WhisperArch, tokenizer,
                 cfg: DecodeConfig | None = None, batch_size: int = 8,
                 max_wait_ms: float = 50.0, transcribe_fn=None,
                 transfer_int16: bool = False,
                 transfer: str | None = None,
                 pipeline: int = 2):
        import jax
        import jax.numpy as jnp

        from .evaluation.harness import make_transcribe_fn, samples_for_arch
        from .models.decode import forced_prefix
        from .runtime_native import BatchLoader

        self.params = params
        self.arch = arch
        self.tokenizer = tokenizer
        self.cfg = cfg or DecodeConfig()
        self.batch_size = batch_size
        self.max_wait_s = max_wait_ms / 1e3
        self.n_samples = samples_for_arch(arch)
        self._fn = transcribe_fn or make_transcribe_fn(arch, self.cfg)
        # wire-transfer codec for the host->device audio stream:
        #   float32 — as-is (4 B/sample)
        #   int16   — PCM (2 B/sample; lossless for 16-bit-PCM-sourced
        #             audio; the on-device cast undoes the scale)
        #   mulaw   — G.711-style u-law uint8 (1 B/sample; ~38 dB SNR on
        #             speech, the telephony standard — accuracy-changing,
        #             opt-in; companding host-side, expansion in-jit)
        self.transfer = transfer or ("int16" if transfer_int16
                                     else "float32")
        if self.transfer not in ("float32", "int16", "mulaw"):
            raise ValueError(f"transfer must be float32|int16|mulaw, "
                             f"got {self.transfer!r}")
        self.transfer_int16 = self.transfer == "int16"
        if self.transfer != "float32":
            base_fn = self._fn
            decode = (mulaw_decode if self.transfer == "mulaw"
                      else lambda w: w.astype(jnp.float32) * (1.0 / 32768.0))

            @jax.jit
            def _fn_wire(params, wire):
                return base_fn(params, decode(wire))

            self._fn = _fn_wire
        self._first_gen = len(forced_prefix(arch, self.cfg))
        # batches in flight (JAX async dispatch). 2 = dispatch batch i+1
        # (host decode/resample/wire-encode + upload) while the device runs
        # batch i, the same overlap that recovered the ~30 ms tunnel tax in
        # bench.py's pipelined accounting (DESIGN.md §8). 1 = fenced.
        self.pipeline = max(1, int(pipeline))
        # Bucketed dispatch: a partially-filled batch runs the SMALLEST
        # compiled batch that covers it instead of padding to batch_size.
        # The full padded program costs the same device time at occupancy
        # 0.2 as at 1.0 (~0.53 s at batch 32), so under paced (open-loop)
        # load the pad-to-full design couldn't serve ANY arrival rate
        # below full-batch capacity stably — measured: 60x offered, 49x
        # served, queue growing. jit caches one executable per bucket
        # shape; warmup() pre-compiles them all.
        self.buckets = tuple(sorted({max(1, batch_size // 4),
                                     max(1, batch_size // 2), batch_size}))
        self._busy_mark = 0.0  # merged-interval device-busy accounting
        self._loader = BatchLoader(batch_size, self.n_samples)
        self._queue: queue.Queue = queue.Queue()
        self.stats = ServiceStats()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    # ------------------------------------------------------------------ API
    def warmup(self) -> None:
        """Compile every bucket's program before serving traffic — the
        first live batch of each size otherwise pays its compile inside a
        request's latency."""
        import jax.numpy as jnp

        dt = (jnp.int16 if self.transfer == "int16"
              else jnp.uint8 if self.transfer == "mulaw" else jnp.float32)
        for b in self.buckets:
            out = self._fn(self.params, jnp.zeros((b, self.n_samples), dt))
            np.asarray(out[0])

    def submit(self, wav: np.ndarray, sample_rate: int = 16000) -> Future:
        """Enqueue one utterance; resolves to
        {"text", "tokens", "audio_seconds", "latency_s"}.

        Audio longer than one 30 s window is transparently split into
        fixed windows that ride the same dynamic batcher as independent
        items (they fill otherwise-idle batch slots and can interleave
        with other requests), then reassembled in order — the result
        gains a "num_chunks" key. Short requests are unaffected.
        """
        wav = np.asarray(wav, np.float32)
        src_win = int(self.n_samples * sample_rate / 16000)
        if len(wav) <= src_win:
            return self._submit_window(wav, sample_rate)
        from .evaluation.longform import chunk_waveform

        t_submit = time.perf_counter()
        futs = [self._submit_window(c, sample_rate, internal=True)
                for c in chunk_waveform(wav, src_win)]
        agg: Future = Future()
        remaining = [len(futs)]
        lock = threading.Lock()

        def _one_done(_f):
            with lock:
                remaining[0] -= 1
                if remaining[0]:
                    return
            try:
                parts = [f.result() for f in futs]  # all done; no blocking
                latency = time.perf_counter() - t_submit
                if not agg.done():
                    agg.set_result({
                        "text": " ".join(p["text"] for p in parts
                                         if p["text"]),
                        "tokens": [t for p in parts for t in p["tokens"]],
                        "audio_seconds": sum(p["audio_seconds"]
                                             for p in parts),
                        "latency_s": latency,
                        "num_chunks": len(parts),
                    })
                # the user-facing request latency (per-window latencies are
                # internal and excluded from stats for chunked requests)
                with self.stats._lock:
                    self.stats.user_requests += 1
                    if len(self.stats.latencies) < ServiceStats.MAX_LATENCIES:
                        self.stats.latencies.append(latency)
            except Exception as e:
                if not agg.done():
                    agg.set_exception(e)

        for f in futs:
            f.add_done_callback(_one_done)
        return agg

    def submit_flac(self, data: bytes) -> Future:
        """Enqueue one FLAC-encoded utterance (the LibriSpeech wire format).

        Short requests (≤ one 30 s window) carry the compressed bytes all
        the way to the native BatchLoader, which decodes/downmixes/resamples
        inside its worker pool — a batch of FLAC requests decodes in
        parallel with zero host-side Python work. Longer audio decodes
        up-front (native) and rides the normal chunked `submit` path.
        Raises ValueError immediately on a malformed or truncated stream
        (frame-level corruption past the metadata surfaces later, as the
        request future's exception — never as a batch-wide failure)."""
        from .audio.flac import parse_stream_info

        try:
            info, _ = parse_stream_info(data)
        except EOFError as e:  # truncated metadata: keep the documented
            raise ValueError(f"malformed FLAC stream: {e}") from e
        src_win = int(self.n_samples * info.sample_rate / 16000)
        if 0 < info.total_samples <= src_win:
            return self._submit_window(
                _FlacRequest(data, info.total_samples), info.sample_rate)
        from .runtime_native import flac_decode

        samples, sr, bits = flac_decode(data)
        wav = samples.astype(np.float32) / float(1 << (bits - 1))
        wav = wav.mean(axis=1) if wav.shape[1] > 1 else wav[:, 0]
        return self.submit(wav, sr)

    def _submit_window(self, wav, sample_rate: int,
                       internal: bool = False) -> Future:
        if self._stop.is_set():
            raise RuntimeError("service is shut down")
        fut: Future = Future()
        if not isinstance(wav, _FlacRequest):
            wav = np.asarray(wav, np.float32)
        self._queue.put((wav, sample_rate, fut,
                         time.perf_counter(), internal))
        with self.stats._lock:
            self.stats.queue_peak = max(self.stats.queue_peak,
                                        self._queue.qsize())
        return fut

    def transcribe(self, wav: np.ndarray, sample_rate: int = 16000,
                   timeout: float | None = None) -> dict:
        """Blocking submit+result. timeout=None auto-scales with the audio
        length (long inputs decode many windows through the shared
        batcher; a fixed 120 s would time out healthy hour-long requests):
        max(120 s, 4x audio duration)."""
        if timeout is None:
            timeout = max(120.0, 4.0 * len(wav) / float(sample_rate))
        return self.submit(wav, sample_rate).result(timeout=timeout)

    def close(self, timeout: float = 30.0) -> None:
        """Drain the queue and stop the worker."""
        self._stop.set()
        self._worker.join(timeout=timeout)

    # ---------------------------------------------------------------- worker
    def _take_batch(self) -> list:
        """Block for the first request, then gather co-riders until the
        batch fills or max_wait elapses."""
        try:
            first = self._queue.get(timeout=0.05)
        except queue.Empty:
            return []
        items = [first]
        deadline = time.perf_counter() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                items.append(self._queue.get(timeout=remaining))
            except queue.Empty:
                break
        return items

    def _run(self) -> None:
        """Worker loop: assemble -> dispatch (async) -> retire.

        JAX dispatch is asynchronous — `self._fn(...)` returns device
        futures immediately; the block happens at `np.asarray` in
        `_finalize`. Keeping up to `self.pipeline` batches in flight lets
        the host side of batch i+1 (native FLAC decode/resample, wire
        encode, upload, result decode of batch i-1) overlap the device
        compute of batch i. Under low load (no new batch assembled this
        iteration) everything in flight retires immediately, so idle-queue
        latency is never inflated by pipeline residency.
        """
        from collections import deque

        import jax.numpy as jnp

        inflight: deque = deque()  # (items, failed, tokens, lengths, t0)
        while True:
            stopping = self._stop.is_set() and self._queue.empty()
            if stopping and not inflight:
                break
            items = [] if stopping else self._take_batch()
            if items:
                failed: dict[int, Exception] = {}
                try:
                    for slot in range(self.batch_size):
                        self._loader.clear(slot)
                    for slot, (wav, sr, _, _, _) in enumerate(items):
                        try:
                            if isinstance(wav, _FlacRequest):
                                self._loader.submit_flac(slot, wav.data)
                            else:
                                self._loader.submit(slot, wav,
                                                    sample_rate=sr)
                        except Exception as e:  # pure-Python FLAC decode
                            # path raises at submit; fail THIS request only
                            failed[slot] = e
                            self._loader.clear(slot)
                    # native decode failures surface per slot after flush —
                    # one corrupt frame must not poison its co-riding batch
                    buf = self._loader.flush(raise_on_error=False)
                    for slot in self._loader.take_error_slots():
                        failed.setdefault(slot, ValueError(
                            "FLAC decode failed (corrupt frame data)"))
                    if self.transfer == "int16":
                        buf = _pcm16(buf)
                    elif self.transfer == "mulaw":
                        buf = mulaw_encode(buf)

                    bucket = next(b for b in self.buckets
                                  if b >= len(items))
                    t0 = time.perf_counter()
                    tokens, lengths = self._fn(self.params,
                                               jnp.asarray(buf[:bucket]))
                    inflight.append((items, failed, tokens, lengths, t0))
                except Exception as e:  # fail the batch, keep serving
                    for _, _, fut, _, _ in items:
                        if not fut.done():
                            fut.set_exception(e)
                # pipeline full: retire the oldest (its device work has
                # been overlapping this batch's host prep), keeping
                # pipeline-1 outstanding while the next batch assembles
                while len(inflight) >= self.pipeline:
                    self._finalize(inflight.popleft())
                # trickle load (e.g. one closed-loop client): nothing is
                # waiting to pipeline with — finalize now instead of
                # letting the dispatched batch's futures sit until the
                # next _take_batch poll times out (~50 ms) (ADVICE r3 #5)
                if self._queue.empty():
                    while inflight:
                        self._finalize(inflight.popleft())
            else:
                while inflight:  # low load / draining: retire everything
                    self._finalize(inflight.popleft())

    def _finalize(self, entry) -> None:
        """Block on one in-flight batch's device results and resolve its
        futures. Device-busy accounting merges overlapping dispatch
        windows (pipelined batches overlap on the device; each wall-clock
        second counts at most once, so `stats.busy_seconds` stays a true
        device-occupancy measure)."""
        items, failed, tokens, lengths, t0 = entry
        try:
            tokens = np.asarray(tokens)   # readback = completion fence
            lengths = np.asarray(lengths)
        except Exception as e:  # async device failure surfaces here
            for _, _, fut, _, _ in items:
                if not fut.done():
                    fut.set_exception(e)
            return
        now = time.perf_counter()
        busy = max(0.0, now - max(t0, self._busy_mark))
        self._busy_mark = max(self._busy_mark, now)

        audio_s = 0.0
        for slot, (wav, sr, fut, t_submit, _) in enumerate(items):
            if slot in failed:
                if not fut.done():
                    fut.set_exception(failed[slot])
                continue
            ids = tokens[slot, self._first_gen: lengths[slot]]
            ids = ids[ids != self.arch.eos_token_id]
            dur = len(wav) / float(sr)
            audio_s += dur
            if not fut.done():   # user may have cancelled while queued
                fut.set_result({
                    "text": self.tokenizer.decode(ids.tolist()),
                    "tokens": ids.tolist(),
                    "audio_seconds": dur,
                    "latency_s": now - t_submit,
                })
        with self.stats._lock:
            self.stats.requests += len(items)
            self.stats.batches += 1
            self.stats.occupancy_sum += len(items) / self.batch_size
            self.stats.audio_seconds += audio_s
            self.stats.busy_seconds += busy
            # latency percentiles are USER-facing: direct (non-chunk)
            # windows only; chunked requests report their aggregate
            # latency from submit()'s completion callback
            self.stats.user_requests += sum(
                1 for it in items if not it[4])
            if len(self.stats.latencies) < ServiceStats.MAX_LATENCIES:
                self.stats.latencies.extend(
                    now - t for (_, _, _, t, internal) in items
                    if not internal)
