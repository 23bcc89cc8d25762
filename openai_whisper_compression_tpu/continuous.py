"""Host orchestration for continuous-batching transcription.

`ContinuousBatcher` drives the three jitted programs built by
`models/continuous.py` (chunk / admit / rebase) from a plain Python loop:
every `chunk` decode steps it reads back the tiny `finished` vector,
retires finished slots (one token-buffer readback), refills them from the
request queue (one jitted admit = mel → encoder → cross-KV scatter), and
rebases the global window when it nears the static cache end.

Why it wins: the reference's serving shape — and our own
`TranscriptionService` dynamic batcher — decodes batch-synchronously, so
every batch runs as long as its longest member (HF `generate`,
`data_utils.py:152`). With real speech-length variance the short
utterances idle in lockstep. Here a finished slot is re-armed within one
chunk (~16 steps), so device steps track the SUM of lengths, not
batches × max. `bench.py --serve-cb` measures both paths on the same
ragged request set.
"""

from __future__ import annotations

import time
from collections import deque
from dataclasses import dataclass, field
from typing import Any, Sequence

import jax.numpy as jnp
import numpy as np

from .config import DecodeConfig, WhisperArch
from .models.continuous import gen_tokens_of_row, make_cb_fns


@dataclass
class CBStats:
    """Counters for one `transcribe_all` run."""

    requests: int = 0
    chunks: int = 0
    device_steps: int = 0          # global counter advance (lockstep steps)
    slot_steps_busy: int = 0       # steps spent on live (unfinished) slots
    slot_steps_total: int = 0      # steps x batch slots
    rebases: int = 0
    admits: int = 0
    admit_passes: int = 0          # jitted admit calls (each uploads
                                   # admit_lanes x n_samples of audio)
    wall_seconds: float = 0.0
    audio_seconds: float = 0.0
    gen_tokens: int = 0
    extra: dict = field(default_factory=dict)

    @property
    def occupancy(self) -> float:
        return (self.slot_steps_busy / self.slot_steps_total
                if self.slot_steps_total else 0.0)

    @property
    def rtfx(self) -> float:
        return (self.audio_seconds / self.wall_seconds
                if self.wall_seconds else 0.0)

    def snapshot(self) -> dict:
        return {"requests": self.requests, "chunks": self.chunks,
                "device_steps": self.device_steps,
                "occupancy": round(self.occupancy, 4),
                "rebases": self.rebases, "admits": self.admits,
                "admit_passes": self.admit_passes,
                "wall_seconds": round(self.wall_seconds, 4),
                "audio_seconds": round(self.audio_seconds, 2),
                "gen_tokens": self.gen_tokens,
                "rtfx": round(self.rtfx, 2), **self.extra}


class ContinuousBatcher:
    """Slot-recycling transcription over a fixed pool of decode slots.

    Output contract: each request's token sequence is the standalone
    `greedy_decode` output for that utterance — [forced prefix + generated
    tokens (incl. final EOT)] — independent of which requests shared the
    pool (bit-exactness covered by tests/test_continuous.py).
    """

    def __init__(self, params, arch: WhisperArch,
                 cfg: DecodeConfig | None = None, batch: int = 8,
                 chunk: int = 16, admit_lanes: int = 4,
                 cache_len: int | None = None, fast_mel: bool = True,
                 fast_gelu: bool = False, merge_at: int | None = None,
                 transfer: str = "float32", overlap: bool = False,
                 stage_encode: bool = True,
                 stage_lanes: int | None = None):
        self.params = params
        self.arch = arch
        self.cfg = cfg or DecodeConfig()
        self.transfer = transfer
        self.overlap = overlap
        # prefill disaggregation: encode arrivals in `stage_lanes`-wide
        # blocks (default = the pool size) into a staging cross-KV, so
        # admits are pure scatters. Measured 9.3 -> 4.1 ms of encoder per
        # admitted request (the dominant engine cost). Costs one extra
        # cross-KV-sized buffer in HBM — disable for memory-tight models.
        self.stage_encode = stage_encode
        self.stage_lanes = stage_lanes or batch
        self._wav_dtype = np.int16 if transfer == "int16" else np.float32
        self.plan, self.fns = make_cb_fns(
            arch, self.cfg, batch, chunk=chunk, admit_lanes=admit_lanes,
            cache_len=cache_len, fast_mel=fast_mel, fast_gelu=fast_gelu,
            merge_at=merge_at, transfer=transfer, overlap=overlap)
        self.state = None

    # -- internals ----------------------------------------------------------

    def _pad_wav(self, wav: np.ndarray) -> np.ndarray:
        n = self.plan.n_samples
        w = np.zeros((n,), self._wav_dtype)
        if self.transfer == "int16":
            w[: min(len(wav), n)] = np.clip(wav[:n] * 32767.0,
                                            -32768, 32767).astype(np.int16)
        else:
            w[: min(len(wav), n)] = wav[:n]
        return w

    def stage(self, wavs: Sequence[np.ndarray]):
        """Pre-pad + upload all request audio as ONE device-resident pool
        (N, n_samples); pass the result to `transcribe_all` instead of the
        wav list and admits become device-side gathers with zero per-admit
        host upload — the serving shape where audio already arrived over
        the wire (and the fair way to benchmark scheduling through a
        tunnelled backend, where per-admit uploads dominate wall)."""
        pool = jnp.asarray(np.stack([self._pad_wav(w) for w in wavs]))
        # pre-compile the stage-width gather (an EAGER op: its first call
        # otherwise pays a full tunnel compile inside the first timed
        # top_up — observed 4.5 s charged to the first scheduler measured)
        if self.stage_encode:
            pool[jnp.zeros((self.stage_lanes,), jnp.int32)].block_until_ready()
        return pool

    def warmup(self) -> None:
        """Compile all three programs (init + one admit + one chunk)."""
        p = self.plan
        self.state = self.fns["init"](self.params)
        zeros = jnp.zeros((p.admit_lanes, p.n_samples),
                          jnp.int16 if self.transfer == "int16"
                          else jnp.float32)
        slots = jnp.arange(p.admit_lanes, dtype=jnp.int32)
        mask = jnp.zeros((p.admit_lanes,), bool)
        caps = jnp.full((p.admit_lanes,), p.max_new, jnp.int32)
        self.state = self.fns["admit"](self.params, self.state, zeros,
                                       slots, mask, caps)
        if self.stage_encode:
            block = self.fns["encode_stage"](
                self.params, jnp.zeros((self.stage_lanes, p.n_samples),
                                       jnp.int16 if self.transfer == "int16"
                                       else jnp.float32))
            self.state = self.fns["admit_from_stage"](
                self.state, block, jnp.zeros((p.admit_lanes,), jnp.int32),
                slots, mask, caps)
        self.state, _ = self.fns["chunk"](self.params, self.state)
        self.state = self.fns["rebase"](self.state, jnp.asarray(0, jnp.int32))
        np.asarray(self.state["pos"])  # fence

    # -- main loop -----------------------------------------------------------

    def transcribe_all(self, wavs: Sequence[np.ndarray],
                       stats: CBStats | None = None,
                       max_new: Sequence[int] | None = None,
                       wave: bool = False,
                       overlap: bool | None = None,
                       durations: Sequence[float] | None = None
                       ) -> list[np.ndarray]:
        """Run every request through the pool; returns per-request token
        sequences (prefix + generated, standalone greedy layout) in input
        order.

        max_new: optional per-request token budgets (serving
        ``max_tokens``) — request i generates at most max_new[i] tokens,
        exactly as standalone greedy with max_new_tokens=max_new[i].
        wave: batch-synchronous scheduling — only admit into an EMPTY
        pool, so every wave runs as long as its longest member (the HF
        `generate` serving shape, reference data_utils.py:152). Same
        kernels and caps as continuous mode; exists so benchmarks can
        isolate the pure scheduling win.

        `wavs` is either a sequence of 1-D waveforms (padded + uploaded
        per admit) or the device pool returned by `stage()` (admits
        gather on-device, zero per-admit upload).
        durations: true per-request audio seconds for stats accounting —
        required for honest rtfx on staged pools, where true lengths are
        unrecoverable from the padded rows (ADVICE r3 #4); without it a
        staged run's audio_seconds credits the full padded window and the
        snapshot labels its rtfx accordingly."""
        p, fns = self.plan, self.fns
        staged = wavs if not isinstance(wavs, (list, tuple)) else None
        eot = self.arch.eos_token_id
        caps_req = ([min(int(m), p.max_new) for m in max_new]
                    if max_new is not None else [p.max_new] * len(wavs))
        stats = stats if stats is not None else CBStats()
        stats.requests += len(wavs)
        if durations is not None:
            stats.audio_seconds += float(sum(durations))
        elif staged is not None:
            stats.audio_seconds += len(wavs) * p.n_samples / 16000.0
            stats.extra["audio_accounting"] = "padded_window"
        else:
            stats.audio_seconds += sum(len(w) for w in wavs) / 16000.0
        results: list[Any] = [None] * len(wavs)
        queue = deque(range(len(wavs)))
        slot_req: list[int | None] = [None] * p.batch
        # host mirror of each occupied slot's start — in non-overlap mode
        # exact, in overlap mode a lower bound — used ONLY to pick rebase
        # shifts (retirement reads the exact start from the snapshot)
        start_h = [0] * p.batch

        t0 = time.perf_counter()
        state = self.state if self.state is not None \
            else fns["init"](self.params)
        # the pool may carry a previous run's window position — the host
        # mirror must resume from the device, not from zero
        pos_h = int(np.asarray(state["pos"]))
        prefix = np.asarray(p.prefix, np.int32)

        # overlap: one-deep chunk pipeline — the sync readback of chunk k
        # (a full tunnel RTT) rides under chunk k+1's execution. Retirement
        # then lags one chunk, so each in-flight record carries the
        # slot->request mapping AS OF ITS DISPATCH (a slot can retire and
        # be re-armed before its old snapshot is consumed) plus any rebase
        # shift applied after its snapshot (sync coordinates predate it).
        overlap = (self.overlap if overlap is None else overlap) and not wave
        if overlap and p.cache_len < p.max_rel + 2 * p.chunk + 1:
            raise ValueError(
                f"cache_len {p.cache_len} too small for the overlapped "
                f"loop (needs {p.max_rel + 2 * p.chunk + 1}; construct "
                "the batcher with overlap=True)")
        margin = (2 * p.chunk if overlap else p.chunk) + 1
        inflight: dict | None = None

        # host-phase wall decomposition (stats.extra): where the loop's
        # wall actually goes — admit dispatches, chunk dispatches, the
        # blocking sync readback — so scheduling-vs-overhead regressions
        # are visible in every recorded run
        t_admit = t_chunk = t_read = t_stage = 0.0

        # prefill disaggregation: encode the NEXT block of queued arrivals
        # in one large-batch pass into a staging cross-KV; admits then
        # gather/scatter rows out of it. FIFO invariant: the block always
        # covers the queue's head, and admits consume lanes in order.
        use_stage = self.stage_encode
        E = self.stage_lanes
        stage_block = None
        stage_reqs: list[int] = []
        stage_next = 0

        def top_up_stage() -> None:
            nonlocal stage_block, stage_reqs, stage_next, t_stage
            if not queue:
                return
            import itertools

            nxt = list(itertools.islice(iter(queue), E))
            ts_ = time.perf_counter()
            if staged is not None:
                idx = np.zeros((E,), np.int32)
                idx[: len(nxt)] = nxt
                wav_block = staged[jnp.asarray(idx)]
            else:
                wav_block = np.zeros((E, p.n_samples), self._wav_dtype)
                for i, r in enumerate(nxt):
                    wav_block[i] = self._pad_wav(wavs[r])
                wav_block = jnp.asarray(wav_block)
            stage_block = fns["encode_stage"](self.params, wav_block)
            stage_reqs = nxt
            stage_next = 0
            stats.extra["stage_passes"] = (
                stats.extra.get("stage_passes", 0) + 1)
            t_stage += time.perf_counter() - ts_

        if use_stage:
            top_up_stage()

        def consume(rec) -> None:
            nonlocal pos_h, t_read
            tr = time.perf_counter()
            sync = np.asarray(rec["sync"])
            t_read += time.perf_counter() - tr
            new_pos = int(sync[0]) - rec["shift"]
            steps = new_pos - pos_h
            pos_h = new_pos
            stats.chunks += 1
            stats.device_steps += steps
            stats.slot_steps_total += steps * p.batch
            stats.slot_steps_busy += steps * rec["live"]
            finished = sync[1: 1 + p.batch].astype(bool)
            # start + tokens come from the SAME snapshot, so extraction
            # coordinates are self-consistent even across later rebases
            start = sync[1 + p.batch: 1 + 2 * p.batch]
            tokens = sync[1 + 2 * p.batch:].reshape(p.batch, p.cache_len)
            for slot, req in rec["occ"].items():
                if finished[slot] and slot_req[slot] == req:
                    gen = gen_tokens_of_row(tokens[slot], int(start[slot]),
                                            p.p_len, caps_req[req], eot)
                    results[req] = np.concatenate([prefix, gen])
                    stats.gen_tokens += int(gen.shape[0])
                    slot_req[slot] = None

        while queue or any(r is not None for r in slot_req):
            # 1) rebase if the coming chunk could run off the window
            # (overlap: the NEXT dispatch runs one un-synced chunk ahead of
            # pos_h, so the guard covers two chunks; start_h entries are
            # LOWER bounds there — an admit's true start can exceed the
            # last synced pos by up to one chunk — which only ever makes
            # the shift conservative, never unsafe)
            if pos_h + margin >= p.cache_len:
                occupied = [start_h[i] for i in range(p.batch)
                            if slot_req[i] is not None]
                shift = min(occupied) if occupied else pos_h
                if shift > 0:
                    state = fns["rebase"](state,
                                          jnp.asarray(shift, jnp.int32))
                    pos_h -= shift
                    for i in range(p.batch):
                        start_h[i] = max(start_h[i] - shift, 0)
                    if inflight is not None:
                        inflight["shift"] += shift
                    stats.rebases += 1

            # 2) admit arrivals into free slots, A lanes per jitted pass,
            # looping until the pool is FULL or the queue empties — a chunk
            # retires up to `batch` slots but one pass re-arms only
            # `admit_lanes`, so stopping after one pass starves the pool
            # whenever mean length ~ chunk (measured on-chip: occupancy
            # 0.21 single-pass -> full-pool looping). A pass is taken only
            # when it can fill at least HALF its lanes (or the queue
            # tail): a nearly-empty pass uploads + encodes dead zero
            # lanes, and waiting one chunk fills them (measured on-chip:
            # always-admit cost ~60% extra admit upload over wave's
            # full-pass admits). Wave mode only refills an EMPTY pool
            # (batch-synchronous comparator).
            free = [i for i in range(p.batch) if slot_req[i] is None]
            if wave:
                # only refill an EMPTY pool, but then fill it completely
                admit_ok = len(free) == p.batch
            # staged admits are pure scatters, so no half-lane gating
            admit_min = 1 if use_stage else max(1, p.admit_lanes // 2)
            while queue and free and (
                    admit_ok if wave
                    else (min(len(free), len(queue))
                          >= min(admit_min, len(queue)))):
                if use_stage and stage_next >= len(stage_reqs):
                    top_up_stage()
                if staged is None and not use_stage:
                    batch_wavs = np.zeros((p.admit_lanes, p.n_samples),
                                          self._wav_dtype)
                lane_reqs = np.zeros((p.admit_lanes,), np.int32)
                lanes = np.zeros((p.admit_lanes,), np.int32)  # stage rows
                slots = np.zeros((p.admit_lanes,), np.int32)
                mask = np.zeros((p.admit_lanes,), bool)
                caps = np.full((p.admit_lanes,), p.max_new, np.int32)
                n_real = 0
                for lane in range(min(p.admit_lanes, len(free))):
                    if not queue:
                        break
                    if use_stage and stage_next >= len(stage_reqs):
                        break  # queue head not yet staged
                    req = queue.popleft()
                    slot = free[lane]
                    if use_stage:
                        # FIFO invariant: block lanes mirror queue order
                        assert req == stage_reqs[stage_next]
                        lanes[lane] = stage_next
                        stage_next += 1
                    elif staged is None:
                        batch_wavs[lane] = self._pad_wav(wavs[req])
                    lane_reqs[lane] = req
                    slots[lane] = slot
                    mask[lane] = True
                    caps[lane] = caps_req[req]
                    slot_req[slot] = req
                    start_h[slot] = pos_h
                    stats.admits += 1
                    n_real += 1
                if n_real == 0:
                    break
                # padding lanes target DISTINCT unused slots: the device
                # scatter must never see duplicate rows (admit_lanes <=
                # batch guarantees enough remain)
                taken = set(slots[:n_real].tolist())
                others = (i for i in range(p.batch) if i not in taken)
                for lane in range(n_real, p.admit_lanes):
                    slots[lane] = next(others)
                ta = time.perf_counter()
                if use_stage:
                    state = fns["admit_from_stage"](
                        state, stage_block, jnp.asarray(lanes),
                        jnp.asarray(slots), jnp.asarray(mask),
                        jnp.asarray(caps))
                else:
                    wav_arg = (staged[jnp.asarray(lane_reqs)] if staged
                               is not None else jnp.asarray(batch_wavs))
                    state = fns["admit"](self.params, state, wav_arg,
                                         jnp.asarray(slots),
                                         jnp.asarray(mask),
                                         jnp.asarray(caps))
                t_admit += time.perf_counter() - ta
                stats.admit_passes += 1
                free = [i for i in range(p.batch) if slot_req[i] is None]
                if use_stage and stage_next >= len(stage_reqs):
                    # dispatch the next block's encode as early as possible
                    # (async; overlaps the coming chunks on the queue)
                    top_up_stage()

            # 3) dispatch one chunk of lockstep decode steps (the state is
            # DONATED to the chunk program; only the fresh sync snapshot
            # survives for the deferred readback)
            tc = time.perf_counter()
            state, sync = fns["chunk"](self.params, state)
            rec = {"sync": sync,
                   "live": sum(r is not None for r in slot_req),
                   "occ": {i: r for i, r in enumerate(slot_req)
                           if r is not None},
                   "shift": 0}
            t_chunk += time.perf_counter() - tc

            # 4) consume a snapshot: retire finished slots via ONE packed
            # readback ([pos, finished..., start..., tokens...] — each
            # extra np.asarray is a full tunnel RTT on remote backends).
            # overlap mode consumes the PREVIOUS chunk's snapshot, so this
            # readback rides under the just-dispatched chunk's execution
            if overlap:
                if inflight is not None:
                    consume(inflight)
                inflight = rec
            else:
                consume(rec)

        self.state = state
        stats.wall_seconds += time.perf_counter() - t0
        stats.extra["t_admit_s"] = round(
            stats.extra.get("t_admit_s", 0.0) + t_admit, 4)
        stats.extra["t_chunk_dispatch_s"] = round(
            stats.extra.get("t_chunk_dispatch_s", 0.0) + t_chunk, 4)
        stats.extra["t_readback_s"] = round(
            stats.extra.get("t_readback_s", 0.0) + t_read, 4)
        if use_stage:
            stats.extra["t_stage_s"] = round(
                stats.extra.get("t_stage_s", 0.0) + t_stage, 4)
        return results
