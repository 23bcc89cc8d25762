"""Continuous batching (models/continuous.py + continuous.py).

The contract under test: every request's token sequence equals the
standalone `greedy_decode` output for that utterance — independent of
which requests shared the slot pool, where in the global window the slot
ran, how many rebases happened, or which admit wave carried it in.

Ragged lengths are constructed honestly from the model itself: with random
weights greedy argmax collapses to one audio-independent token (the
encoder's influence on the logits is ~50x below the token-geometry gaps),
so the fixture crafts the EOT output-embedding row inside the span of the
other rows — along the first principal component of the per-utterance
logit vectors — making the EOT-vs-top gap an audio-dependent, zero-mean
quantity by construction. Greedy then ends at genuinely different steps
per utterance, so slots retire and refill mid-run.
"""

import numpy as np
import pytest

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.continuous import (CBStats,
                                                       ContinuousBatcher)
from openai_whisper_compression_tpu.evaluation.harness import \
    make_transcribe_fn
from openai_whisper_compression_tpu.models import params as P

# vocab small enough that the crafted-EOT construction has headroom
ARCH = ARCHS["test2l"].replace(
    name="test2l-cb", vocab_size=24, bos_token_id=21, eos_token_id=21,
    decoder_start_token_id=22, no_timestamps_token_id=23)
N_SAMPLES = ARCH.max_source_positions * 2 * 160


def _wavs(n, seed=0):
    """Spectrally distinct utterances (random sine pairs + noise) — white
    noise alone gives near-identical mels, washing out all raggedness."""
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        ln = int(rng.integers(4000, N_SAMPLES))
        t = np.arange(ln) / 16000.0
        f1, f2 = rng.uniform(100, 4000, 2)
        out.append((np.sin(2 * np.pi * f1 * t) + np.sin(2 * np.pi * f2 * t)
                    + 0.3 * rng.standard_normal(ln)).astype(np.float32))
    return out


@pytest.fixture(scope="module")
def model():
    import jax
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.audio import features
    from openai_whisper_compression_tpu.models import whisper

    params = P.init_params(ARCH, jax.random.PRNGKey(3))
    # craft the EOT row from the model's own logit statistics (see module
    # docstring): eot = dominant row + gamma * PC1-weighted sum of rows,
    # PC1 taken over per-utterance logits and mean-centred so the
    # EOT-vs-dominant gap splits sign across utterances.
    wavs = _wavs(12, seed=99)
    padded = np.zeros((len(wavs), N_SAMPLES), np.float32)
    for i, w in enumerate(wavs):
        padded[i, : len(w)] = w
    mel = features.preprocess(jnp.asarray(padded), n_mels=ARCH.num_mel_bins,
                              length=N_SAMPLES)
    logits = np.asarray(whisper.forward(
        params, ARCH, mel.astype(jnp.float32),
        jnp.asarray([[22, 23]] * len(wavs))))[:, -1]
    text = list(range(21))
    A = logits[:, text]
    Z = A - A.mean(axis=0, keepdims=True)
    c = np.linalg.svd(Z, full_matrices=False)[2][0]
    m = A.mean(axis=0)
    c = c - ((A @ c).mean() / (A @ m).mean()) * m      # zero-mean the gap
    gamma = 3.0 / max(float((A @ c).std()), 1e-9)
    dom = int(np.bincount(logits.argmax(axis=1)).argmax())
    emb = np.array(params["decoder"]["embed"])
    emb[21] = (emb[dom]
               + gamma * (c[:, None] * emb[text]).sum(axis=0)).astype(
        emb.dtype)
    params["decoder"]["embed"] = jnp.asarray(emb)
    return params


def _standalone(params, cfg, wavs):
    """Per-utterance greedy reference (batch-1 jit, one compile)."""
    import jax.numpy as jnp

    fn = make_transcribe_fn(ARCH, cfg, fast_mel=True)
    out = []
    for w in wavs:
        padded = np.zeros((1, N_SAMPLES), np.float32)
        padded[0, : len(w)] = w
        tokens, lengths = (np.asarray(x) for x in
                           fn(params, jnp.asarray(padded))[:2])
        out.append(tokens[0, : lengths[0]])
    return out


def test_cb_bit_exact_vs_standalone_ragged(model):
    cfg = DecodeConfig(max_new_tokens=16)
    wavs = _wavs(30, seed=99)
    ref = _standalone(model, cfg, wavs)
    lens = sorted(len(r) for r in ref)
    assert len(set(lens)) >= 2, f"fixture lost its raggedness: {lens}"

    # small window + chunk forces mid-flight admits AND multiple rebases
    # (the global counter advances every chunk; 30 requests through 4 slots
    # push it well past cache_len=24)
    cb = ContinuousBatcher(model, ARCH, cfg, batch=4, chunk=5,
                           admit_lanes=2, cache_len=24)
    stats = CBStats()
    got = cb.transcribe_all(wavs, stats=stats)
    assert stats.admits == len(wavs)
    assert stats.rebases >= 1, "window was never rebased — weak test"
    for i, (g, r) in enumerate(zip(got, ref)):
        assert np.array_equal(g, r), (
            f"request {i}: cb={g.tolist()} standalone={r.tolist()}")


def test_cb_pool_reuse_and_order(model):
    """A second run on the same batcher (recycled state) stays exact, and
    results always come back in request order."""
    cfg = DecodeConfig(max_new_tokens=12)
    cb = ContinuousBatcher(model, ARCH, cfg, batch=3, chunk=4, admit_lanes=3)
    for seed in (1, 2):
        wavs = _wavs(7, seed=seed)
        ref = _standalone(model, cfg, wavs)
        got = cb.transcribe_all(wavs)
        for g, r in zip(got, ref):
            assert np.array_equal(g, r)


def test_cb_composes_with_cross_kv_pool(model):
    """The lossy cross-KV pool lever rides through admission identically to
    the standalone path (merged encoder output enters the scatter)."""
    cfg = DecodeConfig(max_new_tokens=10, cross_kv_pool=2)
    wavs = _wavs(5, seed=4)
    ref = _standalone(model, cfg, wavs)
    cb = ContinuousBatcher(model, ARCH, cfg, batch=2, chunk=6, admit_lanes=2)
    got = cb.transcribe_all(wavs)
    for g, r in zip(got, ref):
        assert np.array_equal(g, r)


def test_cb_kv_int8_cross_int8(model):
    """Quantized caches (int8 self-KV + int8 cross-KV) keep the contract."""
    cfg = DecodeConfig(max_new_tokens=10, kv_int8=True, cross_kv_int8=True)
    wavs = _wavs(5, seed=5)
    ref = _standalone(model, cfg, wavs)
    cb = ContinuousBatcher(model, ARCH, cfg, batch=2, chunk=4, admit_lanes=2)
    got = cb.transcribe_all(wavs)
    for g, r in zip(got, ref):
        assert np.array_equal(g, r)


def test_cb_per_request_budgets(model):
    """Per-request `max_new` (serving max_tokens): request i must equal
    standalone greedy with max_new_tokens=caps[i] — including the
    truncation semantics (budget exhaustion does NOT append EOT; a
    natural EOT inside the budget is kept)."""
    import dataclasses

    wavs = _wavs(9, seed=7)
    caps = [2, 5, 9, 3, 12, 4, 7, 2, 6]
    refs = []
    for w, cap in zip(wavs, caps):
        cfg_i = dataclasses.replace(DecodeConfig(max_new_tokens=16),
                                    max_new_tokens=cap)
        refs.append(_standalone(model, cfg_i, [w])[0])
    cb = ContinuousBatcher(model, ARCH, DecodeConfig(max_new_tokens=16),
                           batch=3, chunk=4, admit_lanes=2)
    got = cb.transcribe_all(wavs, max_new=caps)
    for i, (g, r) in enumerate(zip(got, refs)):
        assert np.array_equal(g, r), (
            f"req {i} cap {caps[i]}: cb={g.tolist()} ref={r.tolist()}")


def test_cb_wave_mode_matches_continuous(model):
    """Wave (batch-synchronous) scheduling returns identical tokens to
    continuous scheduling but pays more device steps on a ragged set —
    the accounting gap --serve-cb measures. EOT is suppressed so the
    budgets fully determine lengths (the crafted fixture otherwise ends
    utterances before the long budgets bind)."""
    cfg = DecodeConfig(max_new_tokens=16,
                       suppress_tokens=(ARCH.eos_token_id,))
    wavs = _wavs(12, seed=11)
    caps = [2, 14, 3, 4, 13, 2, 5, 12, 3, 2, 11, 4]
    cb = ContinuousBatcher(model, ARCH, cfg, batch=4, chunk=4, admit_lanes=4)
    w_stats, c_stats = CBStats(), CBStats()
    wave = cb.transcribe_all(wavs, stats=w_stats, max_new=caps, wave=True)
    cont = cb.transcribe_all(wavs, stats=c_stats, max_new=caps)
    for g, r in zip(cont, wave):
        assert np.array_equal(g, r)
    # each wave holds one long request (>=11) and three short (<=5): wave
    # scheduling must pay for the max while continuous recycles slots
    assert c_stats.device_steps < w_stats.device_steps, (
        f"continuous {c_stats.device_steps} >= wave {w_stats.device_steps}")
    assert w_stats.admits == c_stats.admits == len(wavs)


def test_cb_overlap_pipeline_exact(model):
    """overlap=True (one-deep chunk pipeline: the sync readback of chunk k
    rides under chunk k+1) returns exactly the standalone outputs across
    mid-flight admits AND rebases — retirement reads the snapshot's own
    start/tokens, so a rebase applied after a snapshot cannot skew
    extraction coordinates."""
    cfg = DecodeConfig(max_new_tokens=16)
    wavs = _wavs(30, seed=99)
    ref = _standalone(model, cfg, wavs)
    cb = ContinuousBatcher(model, ARCH, cfg, batch=4, chunk=5,
                           admit_lanes=2, cache_len=32, overlap=True)
    stats = CBStats()
    got = cb.transcribe_all(wavs, stats=stats)
    assert stats.rebases >= 1, "window was never rebased — weak test"
    for i, (g, r) in enumerate(zip(got, ref)):
        assert np.array_equal(g, r), (
            f"request {i}: cb={g.tolist()} standalone={r.tolist()}")
    # second run on the recycled pool stays exact too
    wavs2 = _wavs(9, seed=3)
    ref2 = _standalone(model, cfg, wavs2)
    got2 = cb.transcribe_all(wavs2)
    for g, r in zip(got2, ref2):
        assert np.array_equal(g, r)


def test_cb_overlap_with_budgets(model):
    """Per-request budgets keep exact truncation semantics under the
    overlapped loop (slots retire one chunk late but extraction still
    matches standalone greedy with max_new_tokens=cap)."""
    import dataclasses

    wavs = _wavs(9, seed=7)
    caps = [2, 5, 9, 3, 12, 4, 7, 2, 6]
    refs = [_standalone(model,
                        dataclasses.replace(DecodeConfig(max_new_tokens=16),
                                            max_new_tokens=c), [w])[0]
            for w, c in zip(wavs, caps)]
    cb = ContinuousBatcher(model, ARCH, DecodeConfig(max_new_tokens=16),
                           batch=3, chunk=4, admit_lanes=3, overlap=True)
    got = cb.transcribe_all(wavs, max_new=caps)
    for i, (g, r) in enumerate(zip(got, refs)):
        assert np.array_equal(g, r), (
            f"req {i} cap {caps[i]}: cb={g.tolist()} ref={r.tolist()}")


def test_cb_int16_transfer(model):
    """transfer="int16" (halved host->device audio stream) equals the
    float32 path on PCM16-round-tripped audio — the quantization happens
    at the wire, not in the engine."""
    cfg = DecodeConfig(max_new_tokens=10)
    wavs = _wavs(5, seed=6)
    rt = [np.clip(w * 32767.0, -32768, 32767).astype(np.int16)
          .astype(np.float32) / 32767.0 for w in wavs]
    ref = _standalone(model, cfg, rt)
    cb = ContinuousBatcher(model, ARCH, cfg, batch=2, chunk=4,
                           admit_lanes=2, transfer="int16")
    got = cb.transcribe_all(wavs)
    for g, r in zip(got, ref):
        assert np.array_equal(g, r)


def test_cb_staged_pool_matches_list(model):
    """stage() + device-gather admits return exactly what the per-admit
    upload path returns (same engine, different wire)."""
    cfg = DecodeConfig(max_new_tokens=10)
    wavs = _wavs(6, seed=8)
    caps = [3, 8, 2, 6, 10, 4]
    cb = ContinuousBatcher(model, ARCH, cfg, batch=2, chunk=4, admit_lanes=2)
    ref = cb.transcribe_all(wavs, max_new=caps)
    got = cb.transcribe_all(cb.stage(wavs), max_new=caps)
    for g, r in zip(got, ref):
        assert np.array_equal(g, r)


def test_cb_rejects_unsupported_modes(model):
    import jax

    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousBatcher(model, ARCH, DecodeConfig(beam_size=2), batch=2)
    ts_arch = ARCHS["test2l-ts"]
    with pytest.raises(ValueError, match="timestamp"):
        ContinuousBatcher(P.init_params(ts_arch, jax.random.PRNGKey(0)),
                          ts_arch, DecodeConfig(notimestamps=False), batch=2)


def test_cli_transcribe_continuous(tmp_path, capsys):
    """`transcribe --continuous` drives a directory through the pool and
    prints uid<TAB>text per file in deterministic (sorted-uid) order."""
    from openai_whisper_compression_tpu import cli

    rng = np.random.default_rng(0)
    for i in range(4):
        np.save(tmp_path / f"utt{i}.npy",
                (rng.standard_normal(12000) * 0.1).astype(np.float32))
    res = cli.main(["transcribe", "--model", "test2l",
                    "--audio", str(tmp_path), "--continuous",
                    "--cb-slots", "2", "--max-new-tokens", "6"])
    assert [r["uid"] for r in res] == [f"utt{i}" for i in range(4)]
    out = capsys.readouterr().out.splitlines()
    assert len([ln for ln in out if ln.startswith("utt")]) == 4
    for r in res:
        assert isinstance(r["text"], str)


def test_cb_occupancy_beats_lockstep_accounting(model):
    """The stats must show the win mechanism: device steps track the SUM of
    lengths, not waves x max length (the batch-synchronous cost)."""
    cfg = DecodeConfig(max_new_tokens=16)
    wavs = _wavs(12, seed=99)
    ref = _standalone(model, cfg, wavs)
    lens = np.array([len(r) for r in ref])
    assert lens.std() > 0

    cb = ContinuousBatcher(model, ARCH, cfg, batch=4, chunk=4, admit_lanes=4)
    stats = CBStats()
    got = cb.transcribe_all(wavs, stats=stats)
    for g, r in zip(got, ref):
        assert np.array_equal(g, r)
    # batch-synchronous lockstep cost: waves of 4, each paying its max
    p_len = cb.plan.p_len
    waves = [lens[i: i + 4] for i in range(0, len(lens), 4)]
    lockstep_steps = sum(int(w.max()) - 1 for w in waves)  # steps ~ len-1
    assert stats.device_steps <= lockstep_steps + 2 * cb.plan.chunk, (
        f"cb={stats.device_steps} lockstep={lockstep_steps}")
    assert 0.0 < stats.occupancy <= 1.0
    assert stats.gen_tokens == int((lens - p_len).sum())
