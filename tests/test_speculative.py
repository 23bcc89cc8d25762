"""Speculative decoding (models/speculative.py): exact greedy parity,
verify-window equivalence to sequential steps, and round accounting."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.models import (cache as kv_cache,
                                                   decode, params as P,
                                                   speculative, whisper)


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    g = np.random.default_rng(1)
    mel = jnp.asarray(g.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    return arch, params, whisper.encode(params, arch, mel)


def test_verify_window_matches_sequential(setup):
    """One verify_window pass == stepping the same tokens one by one."""
    arch, params, enc = setup
    cfg = DecodeConfig()
    ckv = whisper.precompute_cross_kv(params, arch, enc)
    b = enc.shape[0]
    max_len = 32
    g = np.random.default_rng(2)
    toks = jnp.asarray(g.integers(0, 900, (b, 5)), jnp.int32)

    def run_window(params, enc):
        ckv = whisper.precompute_cross_kv(params, arch, enc)
        cache = kv_cache.init_cache(params, arch, b, max_len,
                                    dtype=enc.dtype)
        return speculative.verify_window(params, arch, toks, jnp.asarray(0),
                                         cache, ckv, max_len)[0]

    def run_steps(params, enc):
        ckv = whisper.precompute_cross_kv(params, arch, enc)
        cache = kv_cache.init_cache(params, arch, b, max_len,
                                    dtype=enc.dtype)
        outs = []
        for i in range(toks.shape[1]):
            logits, cache = decode.decoder_step(
                params, arch, toks[:, i], jnp.asarray(i), cache, ckv,
                max_len)
            outs.append(logits)
        return jnp.stack(outs, axis=1)

    lw = np.asarray(jax.jit(run_window)(params, enc))
    ls = np.asarray(jax.jit(run_steps)(params, enc))
    np.testing.assert_allclose(lw, ls, atol=2e-4)


def test_speculative_equals_greedy_selfdraft(setup):
    """Draft == target: every draft token is accepted, output is exactly
    greedy, and the number of target passes collapses to ~L/(gamma+1)."""
    arch, params, enc = setup
    cfg = DecodeConfig(max_new_tokens=12, language_token_id=None,
                       task_token_id=None)
    tg, lg = jax.jit(lambda p, e: decode.greedy_decode(p, arch, e, cfg))(
        params, enc)
    ts, lsp, rounds = jax.jit(lambda p, e: speculative.speculative_decode(
        p, arch, p, arch, e, e, cfg, gamma=3))(params, enc)
    n = int(np.asarray(lg).min())
    first_gen = len(decode.forced_prefix(arch, cfg))
    # exact prefix parity over greedy's generated stream
    np.testing.assert_array_equal(np.asarray(tg)[:, first_gen:n],
                                  np.asarray(ts)[:, first_gen:n])
    # all drafts accepted -> ceil(12 / (gamma+1)) = 3 rounds
    assert int(rounds) <= -(-cfg.max_new_tokens // 4) + 1


def test_speculative_divergent_draft_still_exact(setup):
    """A DIFFERENT draft model (other seed): acceptance is low but the
    output must still equal target-only greedy."""
    arch, params, enc = setup
    params_d = P.init_params(arch, jax.random.PRNGKey(99))
    g = np.random.default_rng(1)
    mel = jnp.asarray(g.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    enc_d = whisper.encode(params_d, arch, mel)

    cfg = DecodeConfig(max_new_tokens=10, language_token_id=None,
                       task_token_id=None)
    tg, lg = jax.jit(lambda p, e: decode.greedy_decode(p, arch, e, cfg))(
        params, enc)
    ts, lsp, rounds = jax.jit(
        lambda pt, et, pd, ed: speculative.speculative_decode(
            pt, arch, pd, arch, et, ed, cfg, gamma=3))(
        params, enc, params_d, enc_d)
    n = int(np.asarray(lg).min())
    first_gen = len(decode.forced_prefix(arch, cfg))
    np.testing.assert_array_equal(np.asarray(tg)[:, first_gen:n],
                                  np.asarray(ts)[:, first_gen:n])
    assert int(rounds) >= 1


def test_speculative_transcribe_fn_cross_arch(setup):
    """End-to-end harness fn with a SMALLER draft arch: output equals the
    plain transcribe fn's."""
    from openai_whisper_compression_tpu.evaluation.harness import (
        make_speculative_transcribe_fn, make_transcribe_fn)

    arch, params, _ = setup
    arch_d = arch.replace(name="test1l", encoder_layers=1, decoder_layers=1)
    params_d = P.init_params(arch_d, jax.random.PRNGKey(7))
    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None)
    g = np.random.default_rng(4)
    wav = jnp.asarray(
        g.standard_normal((2, arch.max_source_positions * 2 * 160)) * 0.1,
        jnp.float32)
    tg, lg = make_transcribe_fn(arch, cfg)(params, wav)
    ts, lsp = make_speculative_transcribe_fn(arch, arch_d, cfg, gamma=3)(
        params, params_d, wav)
    n = int(np.asarray(lg).min())
    np.testing.assert_array_equal(np.asarray(tg)[:, :n],
                                  np.asarray(ts)[:, :n])


def test_max_length_exactness(setup):
    """Decode that fills the position window to the brim (EOT suppressed,
    max_new_tokens past the cap): tokens AND lengths must equal greedy's
    over the FULL buffer — the gamma+1 workspace padding must never
    truncate or shift a token at the cap (VERDICT r2 item 6)."""
    arch, params, enc = setup
    assert arch.max_target_positions == 32
    cfg = DecodeConfig(max_new_tokens=40, language_token_id=None,
                       task_token_id=None,
                       suppress_tokens=(arch.eos_token_id,))
    tg, lg = jax.jit(lambda p, e: decode.greedy_decode(p, arch, e, cfg))(
        params, enc)
    for gamma in (3, 4):
        ts, lsp, rounds = jax.jit(
            lambda p, e, g=gamma: speculative.speculative_decode(
                p, arch, p, arch, e, e, cfg, gamma=g))(params, enc)
        assert ts.shape == tg.shape
        np.testing.assert_array_equal(np.asarray(tg), np.asarray(ts))
        np.testing.assert_array_equal(np.asarray(lg), np.asarray(lsp))


def test_speculative_rejects_beam_and_timestamps(setup):
    arch, params, enc = setup
    with pytest.raises(ValueError):
        speculative.speculative_decode(
            params, arch, params, arch, enc, enc,
            DecodeConfig(beam_size=2))
    ts_arch = arch.replace(no_timestamps_token_id=900)
    ts_params = P.init_params(ts_arch, jax.random.PRNGKey(0))
    with pytest.raises(ValueError):
        speculative.speculative_decode(
            ts_params, ts_arch, ts_params, ts_arch, enc, enc,
            DecodeConfig(notimestamps=False, language_token_id=None,
                         task_token_id=None))


def test_self_speculative_draft(setup):
    """Layer-dropped self-draft: still exact vs target greedy; shares
    weights (no copies of kept layers)."""
    from openai_whisper_compression_tpu.evaluation.harness import (
        make_speculative_transcribe_fn, make_transcribe_fn)

    arch, params, enc = setup
    draft, arch_d = speculative.self_speculative_draft(params, arch,
                                                       keep_decoder=1)
    assert len(draft["decoder"]["layers"]) == 1
    assert draft["decoder"]["layers"][0]["fc1"]["w"] is \
        params["decoder"]["layers"][0]["fc1"]["w"]

    cfg = DecodeConfig(max_new_tokens=8, language_token_id=None,
                       task_token_id=None)
    g = np.random.default_rng(6)
    wav = jnp.asarray(
        g.standard_normal((2, arch.max_source_positions * 2 * 160)) * 0.1,
        jnp.float32)
    tg, lg = make_transcribe_fn(arch, cfg)(params, wav)
    ts, _ = make_speculative_transcribe_fn(arch, arch_d, cfg, gamma=3)(
        params, draft, wav)
    n = int(np.asarray(lg).min())
    np.testing.assert_array_equal(np.asarray(tg)[:, :n],
                                  np.asarray(ts)[:, :n])
