"""Decode-loop tests: KV-cache path vs full recompute, parity vs torch greedy,
beam-search internal consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.models import decode, whisper
from tests.test_model_parity import make_hf_pair

torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def hf_pair():
    return make_hf_pair(seed=3)


@pytest.fixture(scope="module")
def mel(hf_pair):
    _, _, arch = hf_pair
    g = np.random.default_rng(7)
    return g.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)).astype(np.float32)


def _cfg():
    return DecodeConfig(max_new_tokens=10, language_token_id=None,
                        task_token_id=None, notimestamps=False)


def test_greedy_matches_stepwise_full_recompute(hf_pair, mel):
    """KV-cache decode must equal argmax chain from full-sequence logits."""
    _, params, arch = hf_pair
    cfg = _cfg()
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    tokens, lengths = decode.greedy_decode(params, arch, enc, cfg)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    # slow reference: recompute full decoder each step (no cache)
    ref = [[arch.decoder_start_token_id] for _ in range(mel.shape[0])]
    done = [False, False]
    for _ in range(cfg.max_new_tokens):
        inp = jnp.asarray([r + [arch.eos_token_id] * (max(map(len, ref)) - len(r))
                           for r in ref])
        logits = whisper.decode_logits(params, arch, inp, enc)
        for bi in range(mel.shape[0]):
            if done[bi]:
                continue
            nxt = int(jnp.argmax(logits[bi, len(ref[bi]) - 1]))
            ref[bi].append(nxt)
            if nxt == arch.eos_token_id:
                done[bi] = True
        if all(done):
            break

    for bi in range(mel.shape[0]):
        got = tokens[bi, :lengths[bi]].tolist()
        assert got == ref[bi][:len(got)], f"batch {bi}: {got} vs {ref[bi]}"


def test_greedy_matches_torch(hf_pair, mel):
    """End-to-end greedy tokens match a torch greedy loop over the HF model."""
    model, params, arch = hf_pair
    cfg = _cfg()
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    tokens, lengths = decode.greedy_decode(params, arch, enc, cfg)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)

    t_mel = torch.from_numpy(mel)
    with torch.no_grad():
        enc_t = model.model.encoder(t_mel).last_hidden_state
        for bi in range(mel.shape[0]):
            ids = [arch.decoder_start_token_id]
            for _ in range(cfg.max_new_tokens):
                out = model(encoder_outputs=(enc_t[bi:bi + 1],),
                            decoder_input_ids=torch.tensor([ids]))
                nxt = int(out.logits[0, -1].argmax())
                ids.append(nxt)
                if nxt == arch.eos_token_id:
                    break
            got = tokens[bi, :lengths[bi]].tolist()
            assert got == ids[:len(got)], f"batch {bi}: {got} vs {ids}"


def test_greedy_jits_and_suppress(hf_pair, mel):
    _, params, arch = hf_pair
    # suppress whatever greedy would pick first — output must avoid it
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    base_tokens, _ = decode.greedy_decode(params, arch, enc, _cfg())
    banned = int(base_tokens[0, 1])
    cfg = DecodeConfig(max_new_tokens=5, language_token_id=None,
                       task_token_id=None, notimestamps=False,
                       suppress_tokens=(banned,))
    fn = jax.jit(lambda p, e: decode.greedy_decode(p, arch, e, cfg))
    tokens, lengths = fn(params, enc)
    gen = np.asarray(tokens)[:, 1:]
    assert banned not in gen[0][: int(lengths[0]) - 1]


def test_beam_one_equals_greedy(hf_pair, mel):
    _, params, arch = hf_pair
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    cfg = _cfg()
    g_tokens, g_len = decode.greedy_decode(params, arch, enc, cfg)
    b_tokens, b_len = decode.beam_decode(params, arch, enc, cfg)
    np.testing.assert_array_equal(np.asarray(g_tokens), np.asarray(b_tokens))


def test_beam_score_consistency(hf_pair, mel):
    """Beam result's accumulated logprob must match teacher-forced rescoring."""
    _, params, arch = hf_pair
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    cfg = DecodeConfig(max_new_tokens=6, beam_size=3, language_token_id=None,
                       task_token_id=None, notimestamps=False)
    tokens, lengths = decode.beam_decode(params, arch, enc, cfg)
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    assert tokens.shape[0] == mel.shape[0]

    # rescore best hypotheses teacher-forced
    for bi in range(mel.shape[0]):
        seq = tokens[bi, :lengths[bi]]
        inp = jnp.asarray(seq[:-1])[None]
        logits = whisper.decode_logits(params, arch, inp, enc[bi:bi + 1])
        logp = jax.nn.log_softmax(logits[0].astype(jnp.float32), axis=-1)
        score = float(sum(logp[t, seq[t + 1]] for t in range(len(seq) - 1)))
        assert np.isfinite(score)
        # greedy (beam=1) score must not beat beam-3 score on the same input
        g_tokens, g_len = decode.greedy_decode(
            params, arch, enc[bi:bi + 1],
            DecodeConfig(max_new_tokens=6, language_token_id=None,
                         task_token_id=None, notimestamps=False))
        g_seq = np.asarray(g_tokens)[0, : int(g_len[0])]
        g_inp = jnp.asarray(g_seq[:-1])[None]
        g_logits = whisper.decode_logits(params, arch, g_inp, enc[bi:bi + 1])
        g_logp = jax.nn.log_softmax(g_logits[0].astype(jnp.float32), axis=-1)
        g_score = float(sum(g_logp[t, g_seq[t + 1]]
                            for t in range(len(g_seq) - 1)))
        # normalize by length (cfg.length_penalty = 1.0)
        assert score / len(seq) >= g_score / len(g_seq) - 1e-4


def test_prefill_matches_sequential_steps(hf_pair, mel):
    """Batched prefill fills the KV cache identically (and with matching
    downstream logits) to stepping the prefix token by token — with and
    without a left-padded prompt window."""
    from openai_whisper_compression_tpu.models import cache as kv_cache
    from openai_whisper_compression_tpu.models.whisper import (
        encode, precompute_cross_kv_t)

    _, params, arch = hf_pair
    enc = encode(params, arch, jnp.asarray(mel))
    b = enc.shape[0]
    cross = precompute_cross_kv_t(params, arch, enc)
    max_len = 16
    g = np.random.default_rng(11)

    for start in (None, jnp.asarray([0, 2], jnp.int32)):
        p_len = 5
        toks = jnp.asarray(g.integers(0, arch.vocab_size, (b, p_len)),
                           jnp.int32)
        c0 = kv_cache.init_cache(params, arch, b, max_len, dtype=enc.dtype)
        c_seq = c0
        for i in range(p_len):
            _, c_seq = decode.decoder_step(params, arch, toks[:, i],
                                           jnp.asarray(i), c_seq, cross,
                                           max_len, start=start)
        c_pre = decode.prefill(params, arch, toks, c0, cross, start=start)
        # compare only positions >= start (left-pad slots hold all-masked
        # softmax garbage in both paths and are never attended later)
        s_np = np.zeros(b, int) if start is None else np.asarray(start)
        valid = np.arange(p_len)[None, :] >= s_np[:, None]  # (B, P)
        for a, bb in zip(c_seq, c_pre):
            for key in ("k", "v"):
                x1 = np.asarray(a[key], np.float32)[:, :, :p_len]
                x2 = np.asarray(bb[key], np.float32)[:, :, :p_len]
                m = valid[:, None, :, None]
                np.testing.assert_allclose(np.where(m, x1, 0),
                                           np.where(m, x2, 0), atol=1e-5)
        # next-step logits from both caches agree
        nxt = jnp.asarray(g.integers(0, arch.vocab_size, (b,)), jnp.int32)
        l_seq, _ = decode.decoder_step(params, arch, nxt,
                                       jnp.asarray(p_len), c_seq, cross,
                                       max_len, start=start)
        l_pre, _ = decode.decoder_step(params, arch, nxt,
                                       jnp.asarray(p_len), c_pre, cross,
                                       max_len, start=start)
        np.testing.assert_allclose(np.asarray(l_seq), np.asarray(l_pre),
                                   atol=1e-4)


def test_prefill_with_int8_kv_cache(hf_pair, mel):
    """Prefill writes a quantized cache while attending to exact k/v (the
    standard prefill semantics); decode with kv_int8 runs end-to-end and
    mostly agrees with the fp-cache decode."""
    from openai_whisper_compression_tpu.models.whisper import encode

    _, params, arch = hf_pair
    enc = whisper.encode(params, arch, jnp.asarray(mel))

    def run(**kw):
        cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                           task_token_id=None, notimestamps=False, **kw)
        t, l = decode.greedy_decode(params, arch, enc, cfg)
        return np.asarray(t)

    t8 = run(kv_int8=True)
    tf = run()
    assert (t8 == tf).mean() > 0.6, "int8 self-KV diverged too much"


def test_detect_language(hf_pair, mel):
    """Language-ID step: probs over the language range sum to 1, top token
    in range, and matches a plain softmax over the same logits."""
    from openai_whisper_compression_tpu.models.decode import (
        _language_token_range, detect_language)

    _, params, arch = hf_pair
    enc = whisper.encode(params, arch, mel)
    lo, hi = 900, 910  # carve a pseudo-language range from the test vocab
    probs, top = jax.jit(lambda p, e: detect_language(
        p, arch, e, lang_range=(lo, hi)))(params, enc)
    probs, top = np.asarray(probs), np.asarray(top)
    np.testing.assert_allclose(probs.sum(-1), 1.0, atol=1e-5)
    assert ((top >= lo) & (top < hi)).all()
    assert probs.shape == (enc.shape[0], hi - lo)

    real = ARCHS["tiny"]
    lo2, hi2 = _language_token_range(real)
    # 99 languages for the v2-style vocab: [50259, 50358) with
    # <|translate|>=50358 excluded (ADVICE r1: -4 wrongly included it)
    assert lo2 == 50259 and hi2 == 50358
    assert hi2 - lo2 == 99


def test_token_logprob_trace(hf_pair, mel):
    """return_token_logprobs: per-position trace is zero outside generation
    and its generated-positions mean equals return_logprobs' avg_logprob."""
    _, params, arch = hf_pair
    cfg = _cfg()
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    toks, lens, avg_lp, trace = decode.greedy_decode(
        params, arch, enc, cfg, return_logprobs=True,
        return_token_logprobs=True)
    toks2, lens2 = decode.greedy_decode(params, arch, enc, cfg)
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(toks2))
    trace = np.asarray(trace)
    lens = np.asarray(lens)
    first_gen = len(decode.forced_prefix(arch, cfg))
    assert trace.shape == np.asarray(toks).shape
    # prefix positions carry no logprob
    assert (trace[:, :first_gen] == 0.0).all()
    # generated-token logprobs are real (negative) log-softmax values
    for b in range(trace.shape[0]):
        gen_lps = trace[b, first_gen: lens[b]]
        assert (gen_lps <= 0.0).all()
        n = max(lens[b] - first_gen, 1)
        np.testing.assert_allclose(gen_lps.sum() / n,
                                   np.asarray(avg_lp)[b], rtol=1e-5,
                                   atol=1e-6)
        # nothing written past the stop position
        assert (trace[b, lens[b]:] == 0.0).all()
