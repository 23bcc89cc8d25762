"""Beam search with prompt conditioning and timestamp rules
(models/decode.py beam_decode upgrades; the reference's HF `generate`
supports num_beams+prompt_ids+timestamps together, `data_utils.py:152`)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.models import decode, params as P, whisper


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"].replace(no_timestamps_token_id=900)
    params = P.init_params(arch, jax.random.PRNGKey(21))
    g = np.random.default_rng(13)
    mel = jnp.asarray(g.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    return arch, params, whisper.encode(params, arch, mel)


def _strip_window(tokens, lengths, first_gen):
    return [np.asarray(tokens)[i, first_gen:lengths[i]].tolist()
            for i in range(tokens.shape[0])]


def test_beam_prompt_allpad_equals_no_prompt(setup):
    """A fully-padded prompt window (prompt_lens=0) must not change beam
    results: positions restart at 0 and padding is masked out."""
    arch, params, enc = setup
    cfg = DecodeConfig(max_new_tokens=8, beam_size=3, language_token_id=None,
                       task_token_id=None)
    t0, l0 = jax.jit(lambda p, e: decode.beam_decode(p, arch, e, cfg))(
        params, enc)
    pw = 4
    prompt = jnp.full((enc.shape[0], pw), arch.eos_token_id, jnp.int32)
    plens = jnp.zeros((enc.shape[0],), jnp.int32)
    t1, l1 = jax.jit(lambda p, e: decode.beam_decode(
        p, arch, e, cfg, prompt_tokens=prompt, prompt_lens=plens))(params, enc)
    p_len = len(decode.forced_prefix(arch, cfg))
    assert _strip_window(t0, np.asarray(l0), p_len) == \
        _strip_window(t1, np.asarray(l1), pw + p_len)


def test_beam_prompt_changes_distribution(setup):
    """A real prompt conditions the decoder state (results may differ), and
    the prompt window + forced prefix are preserved in the output buffer."""
    arch, params, enc = setup
    cfg = DecodeConfig(max_new_tokens=6, beam_size=2, language_token_id=None,
                       task_token_id=None)
    rng = np.random.default_rng(7)
    pw = 5
    prompt = jnp.asarray(rng.integers(5, 800, (enc.shape[0], pw)), jnp.int32)
    toks, lens = jax.jit(lambda p, e: decode.beam_decode(
        p, arch, e, cfg, prompt_tokens=prompt))(params, enc)
    toks = np.asarray(toks)
    np.testing.assert_array_equal(toks[:, :pw], np.asarray(prompt))
    prefix = decode.forced_prefix(arch, cfg)
    np.testing.assert_array_equal(
        toks[:, pw:pw + len(prefix)],
        np.tile(np.asarray(prefix, np.int32), (toks.shape[0], 1)))
    assert (np.asarray(lens) >= pw + len(prefix)).all()


def test_beam_timestamp_invariants(setup):
    """Generated tokens under beam+timestamps obey the OpenAI rules: first
    generated token is an early timestamp, timestamps are non-decreasing,
    and any finished segment closes its timestamp pair."""
    arch, params, enc = setup
    cfg = DecodeConfig(max_new_tokens=12, beam_size=3, language_token_id=None,
                       task_token_id=None, notimestamps=False,
                       max_initial_timestamp_index=20)
    toks, lens = jax.jit(lambda p, e: decode.beam_decode(p, arch, e, cfg))(
        params, enc)
    ts_begin = arch.no_timestamps_token_id + 1
    p_len = len(decode.forced_prefix(arch, cfg))
    for row, n in zip(np.asarray(toks), np.asarray(lens)):
        gen = row[p_len:n]
        gen = gen[gen != arch.eos_token_id]
        assert len(gen) >= 1
        assert gen[0] >= ts_begin
        assert gen[0] - ts_begin <= cfg.max_initial_timestamp_index
        ts = [t for t in gen if t >= ts_begin]
        assert ts == sorted(ts)
        assert arch.no_timestamps_token_id not in gen


def test_beam_one_with_prompt_equals_greedy_prompt(setup):
    arch, params, enc = setup
    rng = np.random.default_rng(3)
    prompt = jnp.asarray(rng.integers(5, 800, (enc.shape[0], 4)), jnp.int32)
    cfg1 = DecodeConfig(max_new_tokens=6, beam_size=1, language_token_id=None,
                        task_token_id=None)
    tg, lg = jax.jit(lambda p, e: decode.greedy_decode(
        p, arch, e, cfg1, prompt_tokens=prompt))(params, enc)
    tb, lb = jax.jit(lambda p, e: decode.beam_decode(
        p, arch, e, cfg1, prompt_tokens=prompt))(params, enc)
    np.testing.assert_array_equal(np.asarray(tg), np.asarray(tb))
    np.testing.assert_array_equal(np.asarray(lg), np.asarray(lb))
