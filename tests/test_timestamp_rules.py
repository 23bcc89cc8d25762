"""OpenAI timestamp decoding rules (models/decode.py _apply_timestamp_rules):
token-exact parity with a plain-Python reference, plus structural invariants
(first token is an early timestamp; timestamps non-decreasing; pairs)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.models import decode, params as P, whisper


@pytest.fixture(scope="module")
def ts_setup():
    # proper OpenAI layout (text < eot 897 < sot 898 < nts 899 < ts 900..999)
    arch = ARCHS["test2l-ts"]
    params = P.init_params(arch, jax.random.PRNGKey(21))
    g = np.random.default_rng(13)
    mel = jnp.asarray(g.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    return arch, params, whisper.encode(params, arch, mel)


def _cfg(**kw):
    return DecodeConfig(max_new_tokens=12, language_token_id=None,
                        task_token_id=None, notimestamps=False,
                        max_initial_timestamp_index=20, **kw)


def _ref_rules(logits, generated, arch, cfg, is_first):
    """Plain-Python port of HF WhisperTimeStampLogitsProcessor.__call__
    (itself OpenAI's ApplyTimestampRules) on one row of logits. The jitted
    kernel is additionally pinned against the REAL HF processor end-to-end
    in tests/test_hf_generate_parity.py."""
    ts_begin = arch.no_timestamps_token_id + 1
    eot = arch.eos_token_id
    lg = np.array(logits, np.float32)
    NEG = -1e9
    lg[arch.no_timestamps_token_id] += NEG
    last_is_ts = len(generated) >= 1 and generated[-1] >= ts_begin
    penult_is_ts = len(generated) < 2 or generated[-2] >= ts_begin
    if last_is_ts:
        if penult_is_ts:          # pair done / initial ts: text must follow
            lg[ts_begin:] += NEG
        else:                     # lone ts: plain text suppressed
            lg[:eot] += NEG
    ts_seen = [t for t in generated if t >= ts_begin]
    if ts_seen:                   # non-decreasing; strict once pair closed
        lo = ts_seen[-1] if (last_is_ts and not penult_is_ts) \
            else ts_seen[-1] + 1
        lg[ts_begin:lo] += NEG
    if is_first:
        lg[:ts_begin] += NEG
        lg[ts_begin + cfg.max_initial_timestamp_index + 1:] += NEG
    logp = lg - (np.log(np.sum(np.exp(lg - lg.max()))) + lg.max())
    ts_lp = np.logaddexp.reduce(logp[ts_begin:])
    max_text = logp[:ts_begin].max()
    if ts_lp > max_text:
        lg[:ts_begin] += NEG
    return lg


def test_greedy_matches_python_reference(ts_setup):
    arch, params, enc = ts_setup
    cfg = _cfg()
    tokens, lengths = decode.greedy_decode(params, arch, enc, cfg)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    for bi in range(enc.shape[0]):
        gen = []
        done = False
        seq = [arch.decoder_start_token_id]
        for step in range(cfg.max_new_tokens):
            if done:
                break
            logits = whisper.decode_logits(params, arch, jnp.asarray([seq]),
                                           enc[bi:bi + 1])[0, -1]
            lg = _ref_rules(np.asarray(logits, np.float32), gen,
                            arch, cfg, is_first=(step == 0))
            nxt = int(lg.argmax())
            gen.append(nxt)
            seq.append(nxt)
            if nxt == arch.eos_token_id:
                done = True
        got = tokens[bi, 1: lengths[bi]].tolist()
        assert got == gen[: len(got)], f"batch {bi}: {got} vs {gen}"


def test_structural_invariants(ts_setup):
    arch, params, enc = ts_setup
    tokens, lengths = decode.greedy_decode(params, arch, enc, _cfg())
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    ts_begin = arch.no_timestamps_token_id + 1

    for bi in range(tokens.shape[0]):
        gen = tokens[bi, 1: lengths[bi]].tolist()
        assert gen, "nothing generated"
        # first token is a timestamp within the initial bound
        assert ts_begin <= gen[0] <= ts_begin + 20
        # notimestamps token never sampled; timestamps non-decreasing
        ts_seen = [t for t in gen if t >= ts_begin]
        assert arch.no_timestamps_token_id not in gen
        assert ts_seen == sorted(ts_seen)
        # runs of timestamps have length <= 2 (pairs)
        run = 0
        for t in gen:
            run = run + 1 if t >= ts_begin else 0
            assert run <= 2


def test_rules_disabled_paths(ts_setup):
    """notimestamps=True or a vocab without ts tokens leaves decoding
    untouched (regression guard for the extra loop carry)."""
    arch, params, enc = ts_setup
    plain_arch = ARCHS["test2l"]  # ts region empty (no_timestamps=999)
    p2 = P.init_params(plain_arch, jax.random.PRNGKey(21))
    t1, _ = decode.greedy_decode(p2, plain_arch, enc,
                                 _cfg(timestamp_rules=True))
    t2, _ = decode.greedy_decode(p2, plain_arch, enc,
                                 _cfg(timestamp_rules=False))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))


def test_segments_parser():
    from openai_whisper_compression_tpu.evaluation.longform import (
        segments_from_tokens)

    arch = ARCHS["test2l-ts"]
    tb = 900  # <|0.00|>
    # <|0.00|> w w <|0.40|> <|0.40|> w <|0.80|> eot — a single-timestamp
    # ending: segments close at 0.8 s but the seek advances a FULL window
    # (OpenAI/HF semantics; seek=None means caller-default advance)
    gen = [tb, 5, 6, tb + 20, tb + 20, 7, tb + 40, arch.eos_token_id]
    segs, seek = segments_from_tokens(arch, np.asarray(gen))
    assert len(segs) == 2
    assert segs[0] == {"start": 0.0, "end": pytest.approx(0.4),
                       "tokens": [5, 6], "tok_idx": [1, 2]}
    assert segs[1]["tok_idx"] == [5]
    assert segs[1]["start"] == pytest.approx(0.4)
    assert segs[1]["end"] == pytest.approx(0.8)
    assert seek is None

    # pair ending: seek lands on the pair's timestamp
    gen = [tb, 5, 6, tb + 20, tb + 20, 7, tb + 40, tb + 40]
    segs, seek = segments_from_tokens(arch, np.asarray(gen))
    assert len(segs) == 2
    assert segs[1]["end"] == pytest.approx(0.8)
    assert seek == pytest.approx(0.8)

    # unterminated trailing text, no pair -> one whole-window segment
    segs, seek = segments_from_tokens(arch, np.asarray([tb, 5, 6]))
    assert len(segs) == 1 and segs[0]["end"] is None
    assert seek is None

    # timestamps only, no text -> no reportable segments; seek still obeys
    # the pair arithmetic (pair at <|0.00|> -> seek 0.0, NOT a full window;
    # the caller's stall guard turns a 0 advance into 1 sample)
    segs, seek = segments_from_tokens(arch, np.asarray([tb, tb + 3]))
    assert segs == [] and seek == pytest.approx(0.0)


def test_transcribe_seek_end_to_end(ts_setup):
    from openai_whisper_compression_tpu.evaluation.longform import (
        transcribe_seek)
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        WordTokenizer)

    arch, params, _ = ts_setup
    g = np.random.default_rng(3)
    # ~2.5 windows of audio for the tiny arch
    n_win = 2 * arch.max_source_positions * 160
    wav = (g.standard_normal(int(2.5 * n_win)) * 0.1).astype(np.float32)
    tok = WordTokenizer(arch.vocab_size, special_start=897)
    res = transcribe_seek(params, arch, wav, tok, _cfg())
    assert res["num_windows"] >= 2
    assert isinstance(res["text"], str)
    for s in res["segments"]:
        assert s["start"] >= 0
        if s["end"] is not None:
            assert s["end"] >= s["start"]

    # plain arch (no ts tokens) must refuse loudly
    plain = ARCHS["test2l"]
    p2 = P.init_params(plain, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        transcribe_seek(p2, plain, wav, tok, _cfg())
