"""StreamingTranscriber: incremental decode with LocalAgreement commitment."""

import jax
import numpy as np
import pytest

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.evaluation.harness import samples_for_arch
from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.streaming import (StreamingTranscriber,
                                                      _lcp)


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"].replace(no_timestamps_token_id=900)
    params = P.init_params(arch, jax.random.PRNGKey(7))
    tok = WordTokenizer(arch.vocab_size, special_start=897)
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None, notimestamps=False,
                       max_initial_timestamp_index=20)
    return params, arch, tok, cfg


def test_lcp():
    assert _lcp([(1, 2, 3), (1, 2, 4)]) == 2
    assert _lcp([(1, 2), (1, 2)]) == 2
    assert _lcp([(), (1,)]) == 0
    assert _lcp([]) == 0
    assert _lcp([(5, 6, 7)]) == 3


def test_validation(setup):
    params, arch, tok, cfg = setup
    with pytest.raises(ValueError, match="agreement"):
        StreamingTranscriber(params, arch, tok, cfg, agreement=0)
    with pytest.raises(ValueError, match="timestamp"):
        StreamingTranscriber(params, arch, tok,
                             DecodeConfig(notimestamps=True))


def test_feed_monotonic_commit_and_flush(setup):
    """Committed text only ever grows (string-prefix chain), flush empties
    pending, and a stream longer than one window slides the live window."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, agreement=2,
                              min_step_s=0.5)
    n = samples_for_arch(arch)
    g = np.random.default_rng(0)
    wav = (g.standard_normal(int(2.4 * n)) * 0.1).astype(np.float32)

    committed_history = []
    chunk = n // 4
    for i in range(0, len(wav), chunk):
        out = st.feed(wav[i: i + chunk])
        assert set(out) == {"committed", "pending", "segments",
                            "buffered_s"}
        assert 0.0 <= out["buffered_s"] <= n / 16000.0 + chunk / 16000.0
        committed_history.append(out["committed"])
    assert st._window_start > 0                      # slid past window 1
    final = st.flush()
    assert final["pending"] == ""
    committed_history.append(final["committed"])
    for a, b in zip(committed_history, committed_history[1:]):
        assert b.startswith(a), (a, b)
    # finalized segments carry absolute, non-decreasing start times
    starts = [s["start"] for s in final["segments"]]
    assert starts == sorted(starts)
    # stream is fully consumed
    assert st._window_start == st._total


def test_agreement_one_commits_immediately(setup):
    """agreement=1: every decode's full hypothesis is committed at once."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, agreement=1,
                              min_step_s=0.25)
    n = samples_for_arch(arch)
    g = np.random.default_rng(1)
    out = st.feed((g.standard_normal(n // 2) * 0.1).astype(np.float32))
    assert out["pending"] == ""


def test_min_step_gates_decoding(setup):
    """Feeds smaller than min_step_s don't trigger a decode."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, min_step_s=5.0)
    out = st.feed(np.zeros(16000, np.float32))       # 1 s < 5 s
    assert out["committed"] == "" and out["pending"] == ""
    assert st._decoded_until == 0
    st.feed(np.zeros(5 * 16000, np.float32))
    assert st._decoded_until == st._total


def test_flush_equals_offline_tail(setup):
    """flush() on a sub-window stream decodes once and commits everything;
    conditioning off reproduces the same text for the same audio."""
    params, arch, tok, cfg = setup
    n = samples_for_arch(arch)
    g = np.random.default_rng(2)
    wav = (g.standard_normal(n // 3) * 0.1).astype(np.float32)

    a = StreamingTranscriber(params, arch, tok, cfg,
                             condition_on_previous_text=False)
    a.feed(wav)
    ra = a.flush()
    b = StreamingTranscriber(params, arch, tok, cfg,
                             condition_on_previous_text=False)
    b.feed(wav)
    rb = b.flush()
    assert ra["committed"] == rb["committed"]
    assert ra["pending"] == rb["pending"] == ""


def test_cli_transcribe_stream(tmp_path, capsys):
    """--stream simulates live feeding from a file and prints partials plus
    the final committed line (uses the timestamp-capable test arch)."""
    from openai_whisper_compression_tpu import cli

    g = np.random.default_rng(4)
    wav = (g.standard_normal(2 * 16000) * 0.1).astype(np.float32)
    path = tmp_path / "a.npy"
    np.save(path, wav)
    res = cli.main(["transcribe", "--model", "test2l-ts",
                    "--audio", str(path), "--max-new-tokens", "6",
                    "--stream", "--stream-chunk-s", "0.5"])
    out = capsys.readouterr().out
    assert "|" in out                 # committed | pending partial lines
    assert res["pending"] == ""


def test_divergent_redecode_never_retracts(setup):
    """Commitment is stored as tokens: a hypothesis that disagrees inside
    the committed prefix cannot rewrite committed text (white-box)."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, agreement=2)
    st._exposed_ids = [1, 2, 3, 4, 5]
    st._win_segments = [
        {"start": 0.0, "end": 0.5, "tokens": [1, 2]},
        {"start": 0.5, "end": None, "tokens": [9, 9]},  # diverges at idx 2
    ]
    out = st._texts()
    assert out["committed"] == tok.decode([1, 2, 3, 4, 5])
    assert out["pending"] == tok.decode([9, 9])     # only past the agreement

    # sliding in this state finalizes the committed-consistent complete
    # segment and keeps the committed remainder — total committed unchanged
    st._total = st.n_samples + 1
    st._buf = np.zeros(st._total, np.float32)
    st._slide()
    assert st._final_ids == [1, 2]
    assert st._exposed_ids == [3, 4, 5]
    assert st._texts()["committed"] == tok.decode([1, 2, 3, 4, 5])

    # the extension rule: a hypothesis that still starts with the committed
    # tokens can extend them; one that diverges cannot
    st2 = StreamingTranscriber(params, arch, tok, cfg, agreement=2)
    st2._exposed_ids = [1, 2]
    st2._hyps.extend([(1, 2, 7, 8), (1, 2, 7, 9)])
    st2._win_segments = [{"start": 0.0, "end": None, "tokens": [1, 2, 7, 9]}]
    stable = _lcp(list(st2._hyps))
    common = st2._common()
    assert stable == 3 and common == 2
    if common == len(st2._exposed_ids) and stable > common:
        st2._exposed_ids = list(st2._flat()[:stable])
    assert st2._exposed_ids == [1, 2, 7]


def test_buffer_trimmed_on_slide(setup):
    """Audio before the live window is dropped: memory stays bounded by one
    window regardless of stream length."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.5)
    n = samples_for_arch(arch)
    g = np.random.default_rng(5)
    for _ in range(6):                       # 6 half-windows = 3 windows
        st.feed((g.standard_normal(n // 2) * 0.1).astype(np.float32))
    assert st._window_start > 0
    assert st._base == st._window_start      # consumed audio dropped
    assert len(st._buf) == st._total - st._base
    assert len(st._buf) <= n + n // 2


def test_vad_skips_silent_windows(setup, monkeypatch):
    """vad_threshold: silence never reaches the TPU — no decodes for a pure
    silence stream (including multi-window fast-forward and flush), while a
    loud stream still decodes."""
    params, arch, tok, cfg = setup
    n = samples_for_arch(arch)

    st = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.25,
                              vad_threshold=1e-3)
    calls = {"n": 0}
    real = st._decode_window

    def counted():
        calls["n"] += 1
        real()
    monkeypatch.setattr(st, "_decode_window", counted)

    for _ in range(5):                       # 2.5 windows of silence
        st.feed(np.zeros(n // 2, np.float32))
    out = st.flush()
    assert calls["n"] == 0
    assert out["committed"] == "" and out["segments"] == []
    assert st._window_start == st._total     # fast-forwarded through all

    # speech-level audio still decodes
    st2 = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.25,
                               vad_threshold=1e-3)
    g = np.random.default_rng(6)
    st2.feed((g.standard_normal(n // 2) * 0.1).astype(np.float32))
    assert st2._decoded_until == st2._total


def test_streaming_pool_matches_standalone(setup):
    """Sessions multiplexed through the pool's batched step produce exactly
    the same partials and finals as standalone transcribers fed
    identically (padding rows don't leak across the batch)."""
    from openai_whisper_compression_tpu.streaming import StreamingPool

    params, arch, tok, cfg = setup
    n = samples_for_arch(arch)
    g = np.random.default_rng(8)
    streams = {sid: (g.standard_normal(int(1.5 * n)) * 0.1
                     ).astype(np.float32) for sid in ("a", "b", "c")}

    pool = StreamingPool(params, arch, tok, cfg, max_streams=4,
                         min_step_s=0.5)
    solo = {sid: StreamingTranscriber(params, arch, tok, cfg,
                                      min_step_s=0.5)
            for sid in streams}
    for sid in streams:
        pool.open(sid)
    chunk = n // 3
    for i in range(0, int(1.5 * n), chunk):
        for sid, wav in streams.items():
            pool.feed(sid, wav[i: i + chunk])
        ticked = pool.tick()
        for sid, wav in streams.items():
            ref = solo[sid].feed(wav[i: i + chunk])
            assert ticked[sid]["committed"] == ref["committed"], sid
            assert ticked[sid]["pending"] == ref["pending"], sid
    for sid in list(streams):
        assert pool.close(sid)["committed"] == solo[sid].flush()["committed"]
    assert not pool.sessions


def test_streaming_pool_limits(setup):
    from openai_whisper_compression_tpu.streaming import StreamingPool

    params, arch, tok, cfg = setup
    pool = StreamingPool(params, arch, tok, cfg, max_streams=1)
    pool.open("x")
    with pytest.raises(KeyError, match="already open"):
        pool.open("x")
    with pytest.raises(RuntimeError, match="full"):
        pool.open("y")
    with pytest.raises(ValueError, match="max_streams"):
        StreamingPool(params, arch, tok, cfg, max_streams=0)
    pool.close("x")
    pool.open("y")                      # slot freed


def test_pool_churn_at_scale(setup):
    """VERDICT r2 #7: a 16-slot pool with sessions opening/closing
    mid-run — every closed session yields a final dict, replacements ride
    the SAME compiled step (no recompile: same shapes), stats stay
    consistent, and a surviving session's output is unaffected by the
    churn around it (matches a standalone transcriber fed identically)."""
    from openai_whisper_compression_tpu.streaming import StreamingPool

    params, arch, tok, cfg = setup
    n = samples_for_arch(arch)
    g = np.random.default_rng(10)
    B = 16
    pool = StreamingPool(params, arch, tok, cfg, max_streams=B,
                         min_step_s=0.5)
    keeper_wav = (g.standard_normal(int(1.5 * n)) * 0.1).astype(np.float32)
    solo = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.5)

    pool.open("keeper")
    for i in range(B - 1):
        pool.open(i)
    next_id = B - 1
    finals = []
    chunk = n // 3
    for step, i in enumerate(range(0, int(1.5 * n), chunk)):
        if step > 0:  # churn 4 sessions per round
            for _ in range(4):
                victim = next(s for s in pool.sessions if s != "keeper")
                finals.append(pool.close(victim))
                pool.open(next_id)
                next_id += 1
        for sid in list(pool.sessions):
            wav = keeper_wav if sid == "keeper" else \
                (g.standard_normal(chunk) * 0.1).astype(np.float32)
            pool.feed(sid, keeper_wav[i: i + chunk]
                      if sid == "keeper" else wav)
        ticked = pool.tick()
        ref = solo.feed(keeper_wav[i: i + chunk])
        assert ticked["keeper"]["committed"] == ref["committed"]
        assert ticked["keeper"]["pending"] == ref["pending"]
    assert len(finals) >= 8 and all("committed" in f for f in finals)
    assert len(pool.sessions) == B
    assert pool.close("keeper")["committed"] == solo.flush()["committed"]
    st = pool.stats()
    assert st["decodes"] > 0 and 0 < st["mean_batch_occupancy"] <= 1


def test_pool_stats(setup):
    from openai_whisper_compression_tpu.streaming import StreamingPool

    params, arch, tok, cfg = setup
    n = samples_for_arch(arch)
    g = np.random.default_rng(9)
    pool = StreamingPool(params, arch, tok, cfg, max_streams=4,
                         min_step_s=0.25)
    pool.open("a"); pool.open("b")
    pool.feed("a", (g.standard_normal(n // 2) * 0.1).astype(np.float32))
    pool.feed("b", (g.standard_normal(n // 2) * 0.1).astype(np.float32))
    pool.tick()
    s = pool.stats()
    assert s["open_streams"] == 2
    assert s["ticks"] == 1 and s["batched_calls"] >= 1
    assert s["decodes"] >= 2
    assert 0 < s["mean_batch_occupancy"] <= 1.0
    assert s["busy_seconds"] > 0 and s["rtfx"] > 0
    assert s["audio_seconds"] == pytest.approx(2 * (n // 2) / 16000.0)
    # reset (bench warmup exclusion) zeroes counters but keeps sessions
    pool.reset_stats()
    s2 = pool.stats()
    assert s2["ticks"] == 0 and s2["busy_seconds"] == 0.0
    assert s2["open_streams"] == 2


def test_streaming_with_quantized_model(setup):
    """Streaming rides QTensor params (int8 weights + int8 KV cache)
    unchanged — the compression and serving axes compose."""
    import dataclasses

    from openai_whisper_compression_tpu.quant.api import quantize_params

    params, arch, tok, cfg = setup
    qp = quantize_params(params, "int8")
    qcfg = dataclasses.replace(cfg, kv_int8=True)
    st = StreamingTranscriber(qp, arch, tok, qcfg, min_step_s=0.5)
    n = samples_for_arch(arch)
    g = np.random.default_rng(10)
    wav = (g.standard_normal(int(1.2 * n)) * 0.1).astype(np.float32)
    for i in range(0, len(wav), n // 2):
        st.feed(wav[i: i + n // 2])
    out = st.flush()
    assert out["pending"] == ""
    assert isinstance(out["committed"], str)


def test_min_step_zero_terminates(setup):
    """min_step_s=0 (CLI --stream-chunk-s 0) is clamped to one sample:
    feed() must terminate instead of re-decoding the same window forever."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.0)
    assert st.min_step == 1
    g = np.random.default_rng(11)
    for _ in range(2):
        out = st.feed((g.standard_normal(4000) * 0.1).astype(np.float32))
    assert isinstance(out["committed"], str)


def test_divergent_fallback_does_not_duplicate(setup):
    """Window-full fallback with a hypothesis diverging inside the
    committed prefix finalizes the committed tokens ONLY — the overlapping
    audio is not transcribed twice."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg)
    st._exposed_ids = [1, 2, 3]
    st._win_segments = [{"start": 0.0, "end": None, "tokens": [1, 9]}]
    st._hyps.append((1, 9))
    st._total = st.n_samples + 1
    st._buf = np.zeros(st._total, np.float32)
    st._slide()
    assert st._final_ids == [1, 2, 3]         # no trailing [9] duplication
    assert st._exposed_ids == []


def test_vad_never_discards_decoded_speech(setup):
    """A full window whose RMS fell below the VAD threshold (speech then
    long silence) still finalizes its decoded hypothesis via slide — the
    silence fast-forward only ever skips undecoded windows."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, vad_threshold=1e-3)
    st._exposed_ids = [5, 6]
    st._win_segments = [{"start": 0.0, "end": 0.4, "tokens": [5, 6]}]
    st._hyps.append((5, 6))
    st._total = st.n_samples + 1600
    st._buf = np.zeros(st._total, np.float32)     # silent full window
    st._pump()
    assert st._final_ids == [5, 6]                # slid + finalized
    assert st.flush()["committed"] == tok.decode([5, 6])


def test_self_draft_mechanics(setup):
    """The verified-decode self-draft: set after every decode, re-anchored
    (timestamps shifted to the new origin) across a slide, cleared on a
    draftless reset — and identical stream output either way (the draft
    only moves work; equality is pinned by test_verified_decode.py)."""
    params, arch, tok, cfg = setup
    st = StreamingTranscriber(params, arch, tok, cfg, agreement=1,
                              min_step_s=0.5)
    n = samples_for_arch(arch)
    g = np.random.default_rng(3)
    wav = (g.standard_normal(int(1.5 * n)) * 0.1).astype(np.float32)

    st.feed(wav[: n // 2])
    assert st._draft is not None and len(st._draft) > 0
    d1 = st._draft.copy()
    # drafts are the raw generated tokens of the last decode
    ts_begin = arch.no_timestamps_token_id + 1
    assert d1[0] >= ts_begin

    st.feed(wav[n // 2: int(1.5 * n)])   # crosses a slide
    assert st._window_start > 0
    if st._draft is not None and len(st._draft):
        # re-anchored carry: every timestamp token is in-vocab and the
        # leading timestamp is near the new window origin
        ts = [t for t in st._draft if t >= ts_begin]
        assert all(int(t) < arch.vocab_size for t in ts)

    # draftless decode (draft=None) must behave like a fresh transcriber:
    # replay the same audio with drafts force-cleared before every decode
    st2 = StreamingTranscriber(params, arch, tok, cfg, agreement=1,
                               min_step_s=0.5)
    orig = st2._decode_window

    def no_draft():
        st2._draft = None
        orig()

    st2._decode_window = no_draft
    st3 = StreamingTranscriber(params, arch, tok, cfg, agreement=1,
                               min_step_s=0.5)
    chunk = n // 4
    for i in range(0, len(wav), chunk):
        a = st2.feed(wav[i: i + chunk])
        b = st3.feed(wav[i: i + chunk])
        assert a["committed"] == b["committed"]
        assert a["pending"] == b["pending"]
    assert st2.flush()["committed"] == st3.flush()["committed"]


def test_pool_draft_acceptance_stats(setup):
    """Pool stats expose draft_proposed/accepted; on a static window
    re-decode (no new audio beyond min_step) the draft is accepted."""
    from openai_whisper_compression_tpu.streaming import StreamingPool

    params, arch, tok, cfg = setup
    pool = StreamingPool(params, arch, tok, cfg, max_streams=2,
                         agreement=2, min_step_s=0.25)
    pool.open("a")
    n = samples_for_arch(arch)
    g = np.random.default_rng(5)
    wav = (g.standard_normal(n // 2) * 0.1).astype(np.float32)
    pool.feed("a", wav[: n // 4])
    pool.tick()
    pool.feed("a", wav[n // 4:])
    pool.tick()
    s = pool.stats()
    assert "draft_proposed" in s and "draft_accepted" in s
    assert s["draft_proposed"] > 0          # second tick carried a draft
    assert 0 <= s["draft_accepted"] <= s["draft_proposed"]
    pool.close("a")


def test_pool_row_reuse_zero_flush(setup):
    """A session opened on a previously-used row must see a ZEROED device
    mirror beyond its own audio — stale samples from the row's previous
    owner must not leak into the zero-padded window (the pool's _mzero
    flush on row reuse)."""
    from openai_whisper_compression_tpu.streaming import StreamingPool

    params, arch, tok, cfg = setup
    n = samples_for_arch(arch)
    g = np.random.default_rng(11)
    pool = StreamingPool(params, arch, tok, cfg, max_streams=1,
                         min_step_s=0.25)
    loud = (g.standard_normal(n) * 0.5).astype(np.float32)
    pool.open("a")
    pool.feed("a", loud)
    pool.tick()
    pool.close("a")

    short = (g.standard_normal(n // 4) * 0.1).astype(np.float32)
    solo = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.25)
    ref = solo.feed(short.copy())
    pool.open("b")                    # same pinned row as "a"
    pool.feed("b", short)
    got = pool.tick()["b"]
    assert got["committed"] == ref["committed"]
    assert got["pending"] == ref["pending"]
