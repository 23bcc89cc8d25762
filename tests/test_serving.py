"""Dynamic-batching transcription service (serving.py): correctness vs
direct calls, batching behavior, stats, shutdown."""

import threading

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.evaluation.harness import (
    make_transcribe_fn, samples_for_arch)
from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.decode import forced_prefix
from openai_whisper_compression_tpu.serving import TranscriptionService


@pytest.fixture(scope="module")
def svc_setup():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    tok = WordTokenizer(arch.vocab_size, special_start=897)
    cfg = DecodeConfig(max_new_tokens=6, language_token_id=None,
                       task_token_id=None)
    return arch, params, tok, cfg


def test_results_match_direct(svc_setup):
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=4,
                               max_wait_ms=30)
    rng = np.random.default_rng(0)
    n = samples_for_arch(arch)
    wavs = [rng.standard_normal(int(n * f)).astype(np.float32) * 0.1
            for f in (0.3, 0.7, 1.0)]
    futs = [svc.submit(w) for w in wavs]
    results = [f.result(timeout=120) for f in futs]
    svc.close()

    # direct reference: same jitted fn, individually padded
    fn = make_transcribe_fn(arch, cfg)
    for w, res in zip(wavs, results):
        buf = np.zeros((4, n), np.float32)
        buf[0, : len(w)] = w[:n]
        toks, lens = fn(params, jnp.asarray(buf))
        toks, lens = np.asarray(toks), np.asarray(lens)
        first_gen = len(forced_prefix(arch, cfg))
        ids = toks[0, first_gen: lens[0]]
        ids = ids[ids != arch.eos_token_id]
        assert res["tokens"] == ids.tolist()
        assert res["text"] == tok.decode(ids.tolist())
        assert res["latency_s"] >= 0
    stats = svc.stats.snapshot()
    assert stats["requests"] == 3
    assert stats["batches"] >= 1
    assert 0 < stats["mean_batch_occupancy"] <= 1
    assert 0 < stats["latency_p50_ms"] <= stats["latency_p95_ms"] \
        <= stats["latency_max_ms"]


def test_concurrent_submitters(svc_setup):
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=4,
                               max_wait_ms=20)
    rng = np.random.default_rng(1)
    n = samples_for_arch(arch)
    results = {}

    def client(i):
        wav = rng.standard_normal(n // 2).astype(np.float32) * 0.1
        results[i] = svc.transcribe(wav)

    threads = [threading.Thread(target=client, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=180)
    svc.close()
    assert len(results) == 6
    for r in results.values():
        assert isinstance(r["text"], str)
    stats = svc.stats.snapshot()
    assert stats["requests"] == 6


def test_submit_after_close_raises(svc_setup):
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2)
    svc.close()
    with pytest.raises(RuntimeError):
        svc.submit(np.zeros(100, np.float32))


def test_transfer_int16_pcm_exact(svc_setup):
    """int16 transfer mode: PCM-valued audio (multiples of 1/32768) yields
    IDENTICAL tokens to the float32 path."""
    arch, params, tok, cfg = svc_setup
    rng = np.random.default_rng(4)
    n = samples_for_arch(arch)
    pcm = rng.integers(-2000, 2000, n // 2).astype(np.float32) / 32768.0

    svc_f = TranscriptionService(params, arch, tok, cfg, batch_size=2)
    r_f = svc_f.transcribe(pcm)
    svc_f.close()
    svc_i = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                                 transfer_int16=True)
    r_i = svc_i.transcribe(pcm)
    svc_i.close()
    assert r_f["tokens"] == r_i["tokens"]


def test_mulaw_codec_roundtrip_snr():
    """u-law companding: ~38 dB SNR on speech-scale signals; +-1 exact,
    0 within half a code step."""
    from openai_whisper_compression_tpu.serving import (mulaw_decode,
                                                        mulaw_encode)

    rng = np.random.default_rng(5)
    x = (rng.standard_normal(16000) * 0.1).clip(-1, 1).astype(np.float32)
    u = mulaw_encode(x)
    assert u.dtype == np.uint8
    y = np.asarray(mulaw_decode(jnp.asarray(u)))
    snr = 10 * np.log10(np.mean(x ** 2) / np.mean((x - y) ** 2))
    assert snr > 30.0, snr
    np.testing.assert_allclose(
        np.asarray(mulaw_decode(jnp.asarray(mulaw_encode(
            np.asarray([0.0, 1.0, -1.0], np.float32))))),
        [0.0, 1.0, -1.0], atol=1e-4)


def test_transfer_mulaw_end_to_end(svc_setup):
    """mulaw transfer serves transcriptions (1 B/sample wire format);
    invalid codec names fail fast."""
    arch, params, tok, cfg = svc_setup
    rng = np.random.default_rng(6)
    n = samples_for_arch(arch)
    wav = (rng.standard_normal(n // 2) * 0.1).astype(np.float32)

    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                               transfer="mulaw")
    r = svc.transcribe(wav)
    svc.close()
    assert isinstance(r["tokens"], list) and r["audio_seconds"] > 0
    with pytest.raises(ValueError):
        TranscriptionService(params, arch, tok, cfg, batch_size=2,
                             transfer="opus")


def test_long_audio_transparent_chunking(svc_setup):
    """Audio longer than one window is split, batched, and reassembled in
    order; text equals the direct per-window decode concatenation."""
    from openai_whisper_compression_tpu.evaluation.longform import (
        chunk_waveform)

    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=4,
                               max_wait_ms=20)
    rng = np.random.default_rng(4)
    n = samples_for_arch(arch)
    wav = (rng.standard_normal(int(2.4 * n)) * 0.1).astype(np.float32)
    res = svc.submit(wav).result(timeout=180)
    svc.close()

    assert res["num_chunks"] == 3
    assert res["audio_seconds"] == pytest.approx(len(wav) / 16000.0)

    # direct reference: decode each window individually with the same fn
    fn = make_transcribe_fn(arch, cfg)
    first_gen = len(forced_prefix(arch, cfg))
    texts, all_ids = [], []
    for c in chunk_waveform(wav, n):
        buf = np.zeros((4, n), np.float32)
        buf[0, : len(c)] = c
        toks, lens = fn(params, jnp.asarray(buf))
        toks, lens = np.asarray(toks), np.asarray(lens)
        ids = toks[0, first_gen: lens[0]]
        ids = ids[ids != arch.eos_token_id].tolist()
        all_ids.extend(ids)
        t = tok.decode(ids)
        if t:
            texts.append(t)
    assert res["tokens"] == all_ids
    assert res["text"] == " ".join(texts)


def test_long_audio_interleaves_with_short_requests(svc_setup):
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=4,
                               max_wait_ms=20)
    rng = np.random.default_rng(9)
    n = samples_for_arch(arch)
    long_fut = svc.submit((rng.standard_normal(int(3.2 * n)) * 0.1
                           ).astype(np.float32))
    short_futs = [svc.submit((rng.standard_normal(n // 2) * 0.1
                              ).astype(np.float32)) for _ in range(3)]
    long_res = long_fut.result(timeout=180)
    short_res = [f.result(timeout=180) for f in short_futs]
    stats = svc.stats.snapshot()
    svc.close()
    assert long_res["num_chunks"] == 4
    for r in short_res:
        assert "num_chunks" not in r and isinstance(r["text"], str)
    # 4 long windows + 3 shorts = 7 queue items
    assert stats["requests"] == 7


def test_cancelled_future_does_not_kill_worker(svc_setup):
    """cancel() on a queued request must not crash the worker thread:
    later submissions still complete (the result loop guards fut.done())."""
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                               max_wait_ms=10)
    n = samples_for_arch(arch)
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(n // 2).astype(np.float32) * 0.1
    f1 = svc.submit(wav)
    f1.cancel()                       # may or may not win the race
    f2 = svc.submit(wav)
    res = f2.result(timeout=300)
    assert res["tokens"] is not None
    svc.close()


def test_chunked_request_stats_user_facing(svc_setup):
    """A chunked (long) submit counts as ONE user request with its
    aggregate latency; internal windows inflate only `requests`."""
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                               max_wait_ms=10)
    n = samples_for_arch(arch)
    rng = np.random.default_rng(4)
    long_wav = rng.standard_normal(int(2.5 * n)).astype(np.float32) * 0.1
    res = svc.submit(long_wav).result(timeout=600)
    assert res["num_chunks"] == 3
    stats = svc.stats.snapshot()
    assert stats["requests"] == 3             # 3 windows through the batcher
    assert stats["user_requests"] == 1        # one user-facing request
    assert stats["latency_p50_ms"] == pytest.approx(
        res["latency_s"] * 1e3, rel=0.25)     # aggregate latency recorded
    svc.close()


def test_transcribe_auto_timeout_scales(svc_setup):
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                               max_wait_ms=10)
    n = samples_for_arch(arch)
    wav = (np.random.default_rng(5).standard_normal(n // 2) * 0.1
           ).astype(np.float32)
    res = svc.transcribe(wav)                 # timeout=None -> auto
    assert res["audio_seconds"] > 0
    svc.close()


def test_submit_flac_matches_submit(svc_setup):
    """FLAC-wire requests (decoded inside the native loader pool) produce
    the same transcription as the pre-decoded waveform."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    try:
        from test_flac import encode_flac
    finally:
        sys.path.pop(0)

    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                               max_wait_ms=30)
    rng = np.random.default_rng(7)
    pcm = rng.integers(-20000, 20000, 4096, dtype=np.int64)
    wav = pcm.astype(np.float32) / 32768.0
    try:
        r_wav = svc.submit(wav).result(timeout=120)
        r_flac = svc.submit_flac(encode_flac(pcm)).result(timeout=120)
        assert r_flac["tokens"] == r_wav["tokens"]
        assert r_flac["text"] == r_wav["text"]
        assert r_flac["audio_seconds"] == pytest.approx(4096 / 16000.0)
        with pytest.raises(ValueError):
            svc.submit_flac(b"junk that is not flac")
    finally:
        svc.close()


def test_corrupt_flac_fails_only_its_own_request(svc_setup):
    """ADVICE r2 (medium): frame-level FLAC corruption must fail ONLY the
    corrupt request's future — the valid requests co-riding in the same
    batch complete normally (per-slot error flags from the native loader,
    per-slot try/except on the Python fallback)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    try:
        from test_flac import encode_flac
    finally:
        sys.path.pop(0)
    from openai_whisper_compression_tpu.audio.flac import parse_stream_info

    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=4,
                               max_wait_ms=200)
    rng = np.random.default_rng(11)
    pcm = rng.integers(-20000, 20000, 4096, dtype=np.int64)
    wav = pcm.astype(np.float32) / 32768.0
    good = encode_flac(pcm)
    # valid STREAMINFO, truncated frame section: passes submit_flac's
    # header check, fails in the decode worker
    _, off = parse_stream_info(good)
    corrupt = good[: off + 2]
    try:
        f_wav = svc.submit(wav)
        f_bad = svc.submit_flac(corrupt)
        f_good = svc.submit_flac(good)
        r_wav = f_wav.result(timeout=120)
        r_good = f_good.result(timeout=120)
        with pytest.raises(Exception):
            f_bad.result(timeout=120)
        # the co-riders are unharmed and correct
        assert r_good["tokens"] == r_wav["tokens"]
        assert r_good["text"] == r_wav["text"]
        # truncated METADATA still raises ValueError synchronously
        with pytest.raises(ValueError):
            svc.submit_flac(good[:10])
        # and the service keeps serving after the failure
        assert svc.transcribe(wav)["tokens"] == r_wav["tokens"]
    finally:
        svc.close()


def test_submit_flac_long_audio_chunks(svc_setup):
    """FLAC longer than one window decodes up-front and rides the chunked
    submit path (num_chunks in the result)."""
    import sys

    sys.path.insert(0, "/root/repo/tests")
    try:
        from test_flac import encode_flac
    finally:
        sys.path.pop(0)
    from openai_whisper_compression_tpu.evaluation.harness import \
        samples_for_arch

    arch, params, tok, cfg = svc_setup
    n_win = samples_for_arch(arch)
    n = ((2 * n_win + 1023) // 1024) * 1024  # two windows, whole blocks
    rng = np.random.default_rng(8)
    pcm = rng.integers(-20000, 20000, n, dtype=np.int64)
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                               max_wait_ms=30)
    try:
        res = svc.submit_flac(encode_flac(pcm)).result(timeout=120)
        assert res["num_chunks"] >= 2
        direct = svc.submit(pcm.astype(np.float32) / 32768.0) \
            .result(timeout=120)
        assert res["tokens"] == direct["tokens"]
    finally:
        svc.close()


def test_pipelined_matches_fenced(svc_setup):
    """pipeline=2 (async dispatch, default) produces bit-identical results
    to pipeline=1 (fenced, the pre-pipelining worker) across a multi-batch
    burst, and its merged-interval busy accounting never exceeds wall."""
    import time

    arch, params, tok, cfg = svc_setup
    rng = np.random.default_rng(11)
    n = samples_for_arch(arch)
    wavs = [rng.standard_normal(n // 2).astype(np.float32) * 0.1
            for _ in range(10)]

    results = {}
    for depth in (1, 2):
        svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                                   max_wait_ms=10, pipeline=depth)
        t0 = time.perf_counter()
        futs = [svc.submit(w) for w in wavs]
        results[depth] = [f.result(timeout=300)["tokens"] for f in futs]
        wall = time.perf_counter() - t0
        stats = svc.stats.snapshot()
        svc.close()
        assert stats["requests"] == 10
        assert stats["batches"] == 5
        # merged-interval accounting: busy is a union of dispatch windows,
        # so it can never exceed the burst's wall time
        assert 0 < stats["busy_seconds"] <= wall + 0.5
    assert results[1] == results[2]


def test_close_drains_inflight_batches(svc_setup):
    """close() immediately after a burst must retire every in-flight
    pipelined batch: all futures resolve, none are dropped."""
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                               max_wait_ms=5, pipeline=2)
    rng = np.random.default_rng(12)
    n = samples_for_arch(arch)
    futs = [svc.submit(rng.standard_normal(n // 2).astype(np.float32) * 0.1)
            for _ in range(6)]
    svc.close(timeout=300)
    for f in futs:
        assert f.result(timeout=1)["tokens"] is not None


def test_bucketed_dispatch_partial_batches(svc_setup):
    """A partial batch rides the smallest compiled bucket, and results
    match full-batch serving — the pad-to-full design ran ~0.53 s of
    device time per batch regardless of occupancy, so open-loop arrival
    rates below full-batch capacity could never be served stably."""
    arch, params, tok, cfg = svc_setup
    svc = TranscriptionService(params, arch, tok, cfg, batch_size=8,
                               max_wait_ms=5)
    assert svc.buckets == (2, 4, 8)
    svc.warmup()
    rng = np.random.default_rng(3)
    wav = rng.standard_normal(8000).astype(np.float32) * 0.1
    ref = svc.transcribe(wav)            # rides the bucket-2 program
    svc2 = TranscriptionService(params, arch, tok, cfg, batch_size=2,
                                max_wait_ms=5)
    got = svc2.transcribe(wav)
    assert ref["text"] == got["text"]
    assert ref["tokens"] == got["tokens"]
    svc.close()
    svc2.close()
