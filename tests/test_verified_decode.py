"""verified_greedy_decode (models/speculative.py): bit-exact greedy parity
for arbitrary external drafts — the streaming self-draft tick's engine
(VERDICT r3 next-step #4).

The contract: verified_greedy_decode(draft) == greedy_decode for EVERY
draft (correct, partially correct, junk, empty), every option combination
the streaming path uses (timestamps, prompts, int8 KV). Acceptance only
moves work between the verify pass and the sequential loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS, DecodeConfig
from openai_whisper_compression_tpu.models import (decode, params as P,
                                                   speculative, whisper)


@pytest.fixture(scope="module")
def ts_setup():
    arch = ARCHS["test2l-ts"]
    params = P.init_params(arch, jax.random.PRNGKey(7))
    g = np.random.default_rng(3)
    mel = jnp.asarray(g.standard_normal(
        (3, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    return arch, params, whisper.encode(params, arch, mel)


def _greedy(params, arch, enc, cfg, **kw):
    toks, lens = decode.greedy_decode(params, arch, enc, cfg, **kw)
    return np.asarray(toks), np.asarray(lens)


def _verified(params, arch, enc, cfg, draft, draft_len, **kw):
    toks, lens, n_acc = speculative.verified_greedy_decode(
        params, arch, enc, cfg, jnp.asarray(draft, jnp.int32),
        jnp.asarray(draft_len, jnp.int32), **kw)
    return np.asarray(toks), np.asarray(lens), np.asarray(n_acc)


def _drafts_from(tokens, lens, first_gen, g_width, eot, mode, rng):
    """Build (draft, draft_len) in the given corruption mode."""
    b = tokens.shape[0]
    draft = np.full((b, g_width), eot, np.int32)
    dlen = np.zeros((b,), np.int32)
    for i in range(b):
        gen = tokens[i, first_gen: lens[i]]
        n = min(len(gen), g_width)
        draft[i, :n] = gen[:n]
        dlen[i] = n
        if mode == "empty":
            dlen[i] = 0
        elif mode == "junk":
            draft[i, :] = rng.integers(0, 800, g_width)
            dlen[i] = g_width
        elif mode == "partial":
            k = n // 2
            if k < n:
                draft[i, k:n] = rng.integers(0, 800, n - k)
    return draft, dlen


@pytest.mark.parametrize("mode", ["exact", "partial", "junk", "empty"])
@pytest.mark.parametrize("timestamps", [False, True])
def test_verified_equals_greedy(ts_setup, mode, timestamps):
    arch, params, enc = ts_setup
    cfg = DecodeConfig(notimestamps=not timestamps, max_new_tokens=16,
                       max_initial_timestamp_index=20)
    ref_t, ref_l = _greedy(params, arch, enc, cfg)
    first_gen = len(decode.forced_prefix(arch, cfg))
    rng = np.random.default_rng(11)
    draft, dlen = _drafts_from(ref_t, ref_l, first_gen, 16,
                               arch.eos_token_id, mode, rng)
    got_t, got_l, n_acc = _verified(params, arch, enc, cfg, draft, dlen)
    assert got_l.tolist() == ref_l.tolist()
    np.testing.assert_array_equal(got_t, ref_t)
    if mode == "exact":
        # a fully correct draft accepts (almost) everything: every row's
        # accept count is at least its draft length (the Jacobi round may
        # legitimately commit beyond it)
        assert (n_acc >= dlen).all()
    if mode == "empty":
        # even with nothing proposed, the Jacobi round self-drafts: at
        # least the first greedy token commits parallel-ly
        assert (n_acc >= 1).all()


def test_verified_with_prompt(ts_setup):
    """Prompt conditioning (left-padded, per-row lens) rides the verify
    window's start masking."""
    arch, params, enc = ts_setup
    cfg = DecodeConfig(notimestamps=False, max_new_tokens=12,
                       max_initial_timestamp_index=20)
    pw = 8
    rng = np.random.default_rng(5)
    prompt = np.full((enc.shape[0], pw), arch.eos_token_id, np.int32)
    plen = np.asarray([3, 0, 6], np.int32)
    for i, n in enumerate(plen):
        prompt[i, pw - n:] = rng.integers(0, 800, n)
    pj, lj = jnp.asarray(prompt), jnp.asarray(plen)
    ref_t, ref_l = _greedy(params, arch, enc, cfg, prompt_tokens=pj,
                           prompt_lens=lj)
    first_gen = pw + len(decode.forced_prefix(arch, cfg))
    draft, dlen = _drafts_from(ref_t, ref_l, first_gen, 12,
                               arch.eos_token_id, "partial", rng)
    got_t, got_l, _ = _verified(params, arch, enc, cfg, draft, dlen,
                                prompt_tokens=pj, prompt_lens=lj)
    assert got_l.tolist() == ref_l.tolist()
    np.testing.assert_array_equal(got_t, ref_t)


def test_verified_kv_int8(ts_setup):
    arch, params, enc = ts_setup
    cfg = DecodeConfig(notimestamps=True, max_new_tokens=12, kv_int8=True)
    ref_t, ref_l = _greedy(params, arch, enc, cfg)
    first_gen = len(decode.forced_prefix(arch, cfg))
    rng = np.random.default_rng(9)
    draft, dlen = _drafts_from(ref_t, ref_l, first_gen, 12,
                               arch.eos_token_id, "partial", rng)
    got_t, got_l, _ = _verified(params, arch, enc, cfg, draft, dlen)
    assert got_l.tolist() == ref_l.tolist()
    np.testing.assert_array_equal(got_t, ref_t)


def test_verified_ragged_eot_drafts(ts_setup):
    """Drafts that contain the true EOT plus junk beyond it: the junk
    after an accepted EOT must not be accepted (greedy pads EOT there)."""
    arch, params, enc = ts_setup
    cfg = DecodeConfig(notimestamps=True, max_new_tokens=16)
    ref_t, ref_l = _greedy(params, arch, enc, cfg)
    first_gen = len(decode.forced_prefix(arch, cfg))
    eot = arch.eos_token_id
    b = enc.shape[0]
    rng = np.random.default_rng(13)
    draft = np.full((b, 16), eot, np.int32)
    for i in range(b):
        gen = ref_t[i, first_gen: ref_l[i]]
        n = min(len(gen), 16)
        draft[i, :n] = gen[:n]
        if n + 2 <= 16:          # junk after the (possibly real) EOT
            draft[i, n: n + 2] = rng.integers(0, 800, 2)
    dlen = np.full((b,), 16, np.int32)
    got_t, got_l, _ = _verified(params, arch, enc, cfg, draft, dlen)
    assert got_l.tolist() == ref_l.tolist()
    np.testing.assert_array_equal(got_t, ref_t)


def test_verified_jit_compiles_once(ts_setup):
    """The whole verified decode is one jittable program (the streaming
    pool compiles it once per shape)."""
    arch, params, enc = ts_setup
    cfg = DecodeConfig(notimestamps=False, max_new_tokens=10,
                       max_initial_timestamp_index=20)

    @jax.jit
    def fn(p, e, d, dl):
        t, l, n = speculative.verified_greedy_decode(p, arch, e, cfg, d, dl)
        return t, l, n

    b = enc.shape[0]
    d0 = jnp.full((b, 10), arch.eos_token_id, jnp.int32)
    t0, l0, _ = fn(params, enc, d0, jnp.zeros((b,), jnp.int32))
    ref_t, ref_l = _greedy(params, arch, enc, cfg)
    np.testing.assert_array_equal(np.asarray(t0), ref_t)
    # second call with a real draft reuses the compile
    draft = jnp.asarray(ref_t[:, len(decode.forced_prefix(arch, cfg)):][:, :10],
                        jnp.int32)
    t1, l1, n1 = fn(params, enc, draft, jnp.full((b,), 10, jnp.int32))
    np.testing.assert_array_equal(np.asarray(t1), ref_t)


def test_active_mask_padding_lanes_do_not_constrain(ts_setup):
    """Padding lanes (active=False, draft_len=0) must not drag the
    batch-min continuation to zero: active rows' outputs stay bit-exact
    greedy when junk/empty padding rows share the batch (the StreamingPool
    pads partial groups into its fixed-width program; VERDICT r4 #5)."""
    arch, params, enc = ts_setup
    cfg = DecodeConfig(notimestamps=False, max_new_tokens=10,
                       max_initial_timestamp_index=20)
    ref_t, ref_l = _greedy(params, arch, enc, cfg)
    first_gen = len(decode.forced_prefix(arch, cfg))
    b = enc.shape[0]
    eot = arch.eos_token_id

    # batch = [real rows | one zero-audio padding lane]
    encB = jnp.concatenate([enc, jnp.zeros_like(enc[:1])], axis=0)
    draft = np.full((b + 1, 10), eot, np.int32)
    dlen = np.zeros((b + 1,), np.int32)
    for i in range(b):  # perfect drafts for the real rows
        gen = ref_t[i, first_gen: ref_l[i]][:10]
        draft[i, : len(gen)] = gen
        dlen[i] = len(gen)
    active = np.asarray([True] * b + [False])
    got_t, got_l, n_acc = _verified(params, arch, encB, cfg, draft, dlen,
                                    active=jnp.asarray(active))
    np.testing.assert_array_equal(got_t[:b], ref_t)
    assert got_l[:b].tolist() == ref_l.tolist()
    # the padding lane reports full acceptance (it must not be the min)
    assert int(n_acc[b]) == 10


def test_pool_partial_group_matches_standalone():
    """A pool batch with REAL rows < pool width produces the exact
    standalone transcript for each open session (padding-lane inertness
    end-to-end through StreamingPool.tick)."""
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        default_tokenizer)
    from openai_whisper_compression_tpu.streaming import (StreamingPool,
                                                          StreamingTranscriber)

    arch = ARCHS["test2l-ts"]
    params = P.init_params(arch, jax.random.PRNGKey(7))
    tok = default_tokenizer(arch)
    cfg = DecodeConfig(notimestamps=False, max_new_tokens=8,
                       max_initial_timestamp_index=20)
    rng = np.random.default_rng(5)
    wav = rng.standard_normal((3 * 16000 // 10,)).astype(np.float32) * 0.1

    solo = StreamingTranscriber(params, arch, tok, cfg, min_step_s=0.05)
    solo.feed(wav)
    ref = solo.flush()

    pool = StreamingPool(params, arch, tok, cfg, max_streams=4,
                         min_step_s=0.05)
    pool.open("a")          # 1 real row, 3 padding lanes
    pool.feed("a", wav)
    pool.tick()
    got = pool.close("a")
    assert got["committed"] == ref["committed"]
