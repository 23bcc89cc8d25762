"""Speculative greedy decoding: a small draft Whisper proposes tokens, the
target model verifies them in one batched pass.

The reference decodes strictly autoregressively through HF `generate`
(`data_utils.py:152`). On TPU the decode step is HBM-bandwidth-bound (the
per-step cross-KV stream, see ops/cross_attention.py), so verifying γ draft
tokens in ONE target pass costs barely more than one step — with a
well-matched draft (e.g. whisper-tiny drafting for whisper-small/medium),
acceptance rates of 60-80% turn into a 2-3x decode speedup with an EXACT
greedy guarantee: the output token sequence equals target-only greedy
decoding, bit for bit (tests/test_speculative.py proves equality).

Algorithm (greedy variant of Leviathan et al., arXiv:2211.17192):
  repeat:
    d_1..d_γ   <- γ autoregressive steps of the draft model
    logits_0..γ <- ONE target pass over [t_last, d_1..d_γ]   (verify window)
    accept the longest prefix with argmax(logits_{i-1}) == d_i;
    the first mismatch (or the bonus position) emits the target's own argmax.
Static shapes throughout: γ is fixed, the dynamic accept count only moves
the position counter; stale cache rows beyond it are masked (never read)
and overwritten by later rounds.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..config import DecodeConfig, WhisperArch
from . import cache as kv_cache
from .decode import (NEG_INF, _apply_timestamp_rules, _auto_cache_len,
                     _cross_window_t, _gen_lengths, _suppress_bias,
                     _timestamps_enabled, decoder_step, forced_prefix,
                     prefill)
from .whisper import (CrossKV, _num_heads, attention, cross_attention,
                      embed_tokens, layer_norm, linear, merge_heads, mlp,
                      precompute_cross_kv, precompute_cross_kv_t, project_out,
                      qkv_project)

Params = dict[str, Any]


def verify_window(params: Params, arch: WhisperArch, window: jax.Array,
                  pos: jax.Array, cache: list, cross_kvs: list,
                  max_len: int,
                  start: jax.Array | None = None) -> tuple[jax.Array, list]:
    """Run a (B, W) token window at positions [pos, pos+W) through the
    decoder in one pass, attending to the existing cache below `pos` plus
    causally within the window. Returns (logits (B, W, V), updated cache).

    start: optional (B,) first valid slot per sequence (left-padded prompt
    masking + sequence-relative positions, exactly as in `prefill` /
    `decoder_step`).

    This is chunked prefill at a dynamic offset — the target-model verify
    pass of speculative decoding."""
    dec = params["decoder"]
    b, w = window.shape
    x = embed_tokens(dec, window.reshape(-1)).reshape(b, w, -1)
    if start is None:
        prow = lax.dynamic_slice_in_dim(dec["pos"], pos, w, axis=0)
        x = x + prow[None].astype(x.dtype)
    else:
        pidx = jnp.maximum(pos + jnp.arange(w)[None, :] - start[:, None], 0)
        x = x + dec["pos"][pidx].astype(x.dtype)

    # mask over cache slots: row i may attend to slot s iff s <= pos + i
    slot = jnp.arange(max_len)[None, :]                  # (1, S)
    row = jnp.arange(w)[:, None]                         # (W, 1)
    ok = (slot <= (pos + row))[None]                     # (1, W, S)
    if start is not None:
        ok = jnp.logical_and(ok, slot[None] >= start[:, None, None])
    mask = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)[:, None]

    new_cache = []
    for i, layer in enumerate(dec["layers"]):
        p = layer["attn"]
        h = _num_heads(p, arch.head_dim)
        hs = layer_norm(x, layer["attn_ln"])
        q, k, v = qkv_project(p, hs, h)
        entry = kv_cache.update(cache[i], k, v, pos)
        new_cache.append(entry)
        k_all, v_all = kv_cache.read(entry, q.dtype)
        o = attention(q, k_all, v_all, mask)
        x = x + linear(merge_heads(o), p["o"]["w"], p["o"].get("b"))

        hs_c = layer_norm(x, layer["cross_ln"])
        if isinstance(cross_kvs[i], CrossKV):
            x = x + _cross_window_t(layer["cross"], hs_c, cross_kvs[i],
                                    arch.head_dim)
        else:
            x = x + cross_attention(layer["cross"], hs_c, cross_kvs[i],
                                    arch.head_dim)
        x = x + mlp(layer, layer_norm(x, layer["mlp_ln"]))
    x = layer_norm(x, dec["ln"])
    return project_out(dec, x), new_cache


def _make_cross_kvs(params, arch, enc_out, cfg):
    if cfg.cross_pallas:
        bits = 4 if cfg.cross_kv_int4 else (8 if cfg.cross_kv_int8 else 16)
        return precompute_cross_kv_t(params, arch, enc_out, bits=bits)
    return precompute_cross_kv(params, arch, enc_out, int8=cfg.cross_kv_int8)


def _pad_positions(params: Params, extra: int) -> Params:
    """Return params with the decoder position table extended by `extra`
    zero rows. Speculative drafting may *compute* (never accept) tokens up
    to gamma positions past greedy's last slot; padding the table keeps
    those overrun reads in-bounds without perturbing any accepted position
    (pad rows feed only predictions that the accept clamp discards)."""
    dec = params["decoder"]
    pos = dec["pos"]
    pad = jnp.zeros((extra, pos.shape[-1]), pos.dtype)
    return {**params, "decoder": {**dec,
                                  "pos": jnp.concatenate([pos, pad], axis=0)}}


def speculative_decode(params_t: Params, arch_t: WhisperArch,
                       params_d: Params, arch_d: WhisperArch,
                       enc_t: jax.Array, enc_d: jax.Array,
                       cfg: DecodeConfig | None = None,
                       gamma: int = 4,
                       max_len: int | None = None
                       ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Speculative greedy decode.

    params_t/arch_t/enc_t: target model + its encoder output (B, S, d_t).
    params_d/arch_d/enc_d: draft model + its encoder output.
    Both must share the tokenizer/vocab and special token ids (any Whisper
    size pair does). gamma: draft tokens per round.

    Returns (tokens (B, max_len), lengths (B,), rounds scalar) — tokens and
    lengths are exactly what `greedy_decode(params_t, ...)` would produce,
    bit for bit, INCLUDING outputs that fill the position window to the
    brim; `rounds` counts target passes (≈ decode steps saved vs.
    sequential).

    Length-cap mechanics: the draft needs up to `gamma` position slots of
    lookahead past greedy's last slot, so the loop runs in a workspace
    padded by `gamma + 1` slots (KV caches, token buffer, and a zero-padded
    position table). Acceptance is clamped at greedy's `limit`, overrun
    drafts are discarded, and the output is sliced back to greedy's
    `max_len` — so the padding never changes a single accepted token
    (tests/test_speculative.py::test_max_length_exactness).
    """
    cfg = cfg or DecodeConfig()
    if cfg.beam_size > 1:
        raise ValueError("speculative decoding is greedy-only")
    from .decode import _timestamps_enabled

    if _timestamps_enabled(arch_t, cfg):
        raise ValueError("speculative decoding does not apply the timestamp "
                         "rules; decode with notimestamps=True (the default) "
                         "or use greedy_decode")
    b = enc_t.shape[0]
    eot = arch_t.eos_token_id

    prefix = forced_prefix(arch_t, cfg)
    p_len = len(prefix)
    # max_len matches greedy_decode exactly (it defines the output shape and
    # the decode limit); the loop itself runs in a gamma+1-padded workspace
    # `ws_len` so drafting near the cap never truncates accepted tokens.
    max_len = min(max_len or _auto_cache_len(arch_t, p_len, cfg),
                  arch_t.max_target_positions)
    ws_len = max_len + gamma + 1
    params_t = _pad_positions(params_t, gamma + 1)
    params_d = _pad_positions(params_d, gamma + 1)
    sup = jnp.asarray(_suppress_bias(arch_t, tuple(cfg.suppress_tokens)))
    begin_sup = jnp.asarray(
        _suppress_bias(arch_t, tuple(cfg.begin_suppress_tokens)))

    ckv_t = _make_cross_kvs(params_t, arch_t, enc_t, cfg)
    ckv_d = _make_cross_kvs(params_d, arch_d, enc_d, cfg)
    cache_t = kv_cache.init_cache(params_t, arch_t, b, ws_len,
                                  dtype=enc_t.dtype, int8=cfg.kv_int8)
    cache_d = kv_cache.init_cache(params_d, arch_d, b, ws_len,
                                  dtype=enc_d.dtype, int8=cfg.kv_int8)

    tokens = jnp.full((b, ws_len), eot, jnp.int32)
    tokens = tokens.at[:, :p_len].set(jnp.asarray(prefix, jnp.int32)[None])

    if p_len > 1:
        cache_t = prefill(params_t, arch_t, tokens[:, : p_len - 1], cache_t,
                          ckv_t)
        cache_d = prefill(params_d, arch_d, tokens[:, : p_len - 1], cache_d,
                          ckv_d)

    step_d = functools.partial(decoder_step, params_d, arch_d,
                               cross_kvs=ckv_d, max_len=ws_len,
                               self_pallas=cfg.self_pallas)

    limit = min(max_len, p_len + cfg.max_new_tokens)  # == greedy's limit
    first_gen = p_len

    def bias(logits, pos):
        logits = logits + sup
        return jnp.where(pos == first_gen - 1, logits + begin_sup, logits)

    def cond(state):
        _, _, _, pos, finished, _ = state
        return jnp.logical_and(pos < limit - 1, ~jnp.all(finished))

    def body(state):
        tokens, cache_t, cache_d, pos, finished, rounds = state
        # ---- draft: gamma sequential steps from position pos
        def draft_step(carry, i):
            toks, cd = carry
            logits, cd = step_d(toks[:, pos + i], pos + i, cd)
            logits = bias(logits, pos + i)
            nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
            toks = lax.dynamic_update_slice(toks, nxt[:, None],
                                            (0, pos + i + 1))
            return (toks, cd), nxt

        (tokens, cache_d), _ = lax.scan(draft_step, (tokens, cache_d),
                                        jnp.arange(gamma))

        # ---- target: one verify pass over [t_pos, d_1..d_gamma]
        window = lax.dynamic_slice(tokens, (0, pos), (b, gamma + 1))
        logits_w, cache_t = verify_window(params_t, arch_t, window, pos,
                                          cache_t, ckv_t, ws_len)
        pred = []
        for i in range(gamma + 1):
            pred.append(jnp.argmax(bias(logits_w[:, i], pos + i), axis=-1))
        pred = jnp.stack(pred, axis=1).astype(jnp.int32)  # (B, gamma+1)

        drafts = lax.dynamic_slice(tokens, (0, pos + 1), (b, gamma))
        match = pred[:, :gamma] == drafts                 # (B, gamma)
        n_acc = jnp.argmin(jnp.pad(match, ((0, 0), (0, 1))), axis=1)
        n_acc = jnp.where(match.all(axis=1), gamma, n_acc)  # (B,) in [0,gamma]

        # batch moves in lockstep: advance by the batch-min acceptance,
        # clamped so the last write lands at limit-1 exactly like greedy
        # (overrun drafts past the cap are computed but never accepted)
        n = jnp.min(jnp.where(finished, gamma, n_acc))
        n = jnp.minimum(n, limit - 2 - pos)
        # next token after the accepted run is the target's own prediction
        fix = jnp.take(pred, n, axis=1)                   # (B,)
        fix = jnp.where(finished, eot, fix)
        tokens = lax.dynamic_update_slice(tokens, fix[:, None],
                                          (0, pos + n + 1))
        # EOT inside the accepted run finishes the row at its first EOT
        run = lax.dynamic_slice(tokens, (0, pos + 1), (b, gamma + 1))
        keep = jnp.arange(gamma + 1)[None, :] <= n
        hit_eot = jnp.logical_and(keep, run == eot).any(axis=1)
        finished = jnp.logical_or(finished, hit_eot)

        return tokens, cache_t, cache_d, pos + n + 1, finished, rounds + 1

    state = (tokens, cache_t, cache_d, jnp.asarray(p_len - 1),
             jnp.zeros((b,), bool), jnp.asarray(0))
    tokens, _, _, pos, finished, rounds = lax.while_loop(cond, body, state)
    tokens = tokens[:, :max_len]  # drop the draft-overrun workspace pad

    # greedy stopping semantics: everything strictly after a row's first
    # generated EOT becomes EOT (later rounds may have left draft junk
    # there), and a round may overshoot max_new_tokens by up to gamma —
    # clamp to the greedy contract
    gen = tokens[:, first_gen:]
    over = jnp.arange(gen.shape[1])[None, :] >= cfg.max_new_tokens
    gen = jnp.where(over, eot, gen)
    is_eot = (gen == eot).astype(jnp.int32)
    after_first_eot = (jnp.cumsum(is_eot, axis=1) - is_eot) > 0
    tokens = tokens.at[:, first_gen:].set(jnp.where(after_first_eot, eot, gen))

    lengths = first_gen + _gen_lengths(tokens, first_gen, pos, eot)
    return tokens, lengths, rounds


def _last_ts_table(draft: jax.Array, ts_begin: int) -> jax.Array:
    """(B, G) draft -> (B, G+1) last-emitted-timestamp table: out[:, j] is
    the LAST timestamp token among draft[:, :j] (0 when none) — the
    `last_ts` greedy_decode's carry would hold when conditioning on the
    first j draft tokens."""
    b, g = draft.shape
    is_ts = draft >= ts_begin
    idx = jnp.where(is_ts, jnp.arange(g)[None, :], -1)
    li = lax.cummax(idx, axis=1)                            # inclusive
    li = jnp.concatenate([jnp.full((b, 1), -1, li.dtype), li], axis=1)
    val = jnp.take_along_axis(draft, jnp.maximum(li, 0)[:, 1:], axis=1)
    val = jnp.concatenate([jnp.zeros((b, 1), draft.dtype), val], axis=1)
    return jnp.where(li >= 0, val, 0)


def verified_greedy_decode(params: Params, arch: WhisperArch,
                           enc_out: jax.Array, cfg: DecodeConfig,
                           draft: jax.Array, draft_len: jax.Array,
                           max_len: int | None = None,
                           prompt_tokens: jax.Array | None = None,
                           prompt_lens: jax.Array | None = None,
                           rounds: int = 2,
                           active: jax.Array | None = None
                           ) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Greedy decode that consumes an EXTERNAL draft (self-speculation for
    streaming re-decodes): verify the draft's generated tokens in ONE
    windowed target pass, then continue ordinary greedy stepping from the
    batch-min divergence point. Output is bit-identical to
    `greedy_decode(params, arch, enc_out, cfg, prompt_tokens=...)` — the
    draft only moves work from sequential steps into the verify pass
    (tests/test_verified_decode.py pins equality; the draft may be
    arbitrary junk).

    Use case (streaming.py tick): consecutive 0.5 s ticks re-decode a 30 s
    window whose hypothesis is almost unchanged — the previous tick's
    tokens draft this tick, so per-tick sequential steps scale with the
    NEW SUFFIX, not the window (VERDICT r3 next-step #4). Unlike
    `speculative_decode` this supports the timestamp rules (they are pure
    logit-space functions of the already-known window) and prompt
    conditioning, and needs no second model.

    draft: (B, G) int32 proposed GENERATED tokens (G static, <=
    cfg.max_new_tokens); draft_len: (B,) valid counts (0 = no draft: the
    verify pass contributes nothing and the loop runs exactly greedy).
    rounds: verify/Jacobi passes before sequential continuation (see the
    round-loop comment below; >=1).
    active: optional (B,) bool — False rows are PADDING lanes (a
    StreamingPool batches a partial group into its fixed-width program):
    they are treated as fully accepted + finished so they never constrain
    the batch-min continuation point or the sequential loop's
    termination. Without this, one padding lane (draft_len=0 → n_acc=0)
    forced a FULL sequential re-decode of every row in the batch — the
    r4 streaming rows measured exactly that (VERDICT r4 #5). Outputs of
    inactive rows are unspecified; callers must ignore them.
    Returns (tokens (B, max_len), lengths (B,), n_accepted (B,)).
    """
    cfg = cfg or DecodeConfig()
    if cfg.beam_size > 1:
        raise ValueError("verified decode is greedy-only")
    b = enc_out.shape[0]
    eot = arch.eos_token_id
    g = draft.shape[1]
    if g < 1 or g > cfg.max_new_tokens:
        raise ValueError(f"draft width {g} must be in [1, max_new_tokens]")

    prefix = forced_prefix(arch, cfg)
    p_len = len(prefix)
    pw = 0 if prompt_tokens is None else prompt_tokens.shape[1]
    max_len = max_len or _auto_cache_len(arch, pw + p_len, cfg)
    sup = jnp.asarray(_suppress_bias(arch, tuple(cfg.suppress_tokens)))
    begin_sup = jnp.asarray(
        _suppress_bias(arch, tuple(cfg.begin_suppress_tokens)))

    if cfg.cross_kv_pool > 1 or cfg.cross_kv_merge > 0:
        from .merge import merge_encoder_tokens

        enc_out = merge_encoder_tokens(enc_out, pool=cfg.cross_kv_pool,
                                       merge_r=cfg.cross_kv_merge)
    cross_kvs = _make_cross_kvs(params, arch, enc_out, cfg)
    cache = kv_cache.init_cache(params, arch, b, max_len,
                                dtype=enc_out.dtype, int8=cfg.kv_int8)

    # token buffer: [prompt | prefix | draft | EOT pad] — same layout as
    # greedy_decode with the draft written into the generated region
    tokens = jnp.full((b, max_len), eot, jnp.int32)
    start = None
    if pw:
        tokens = tokens.at[:, :pw].set(prompt_tokens.astype(jnp.int32))
        if prompt_lens is None:
            prompt_lens = jnp.full((b,), pw, jnp.int32)
        start = (pw - prompt_lens).astype(jnp.int32)
    tokens = tokens.at[:, pw: pw + p_len].set(
        jnp.asarray(prefix, jnp.int32)[None])
    first_gen = pw + p_len
    limit = min(max_len, first_gen + cfg.max_new_tokens)
    # clip the draft so even a full accept never passes greedy's last
    # written index (limit - 1)
    g_eff = min(g, limit - 1 - first_gen + 1)  # tokens writable from first_gen
    draft = draft[:, :g_eff].astype(jnp.int32)
    draft_len = jnp.minimum(draft_len.astype(jnp.int32), g_eff)
    keep = jnp.arange(g_eff)[None, :] < draft_len[:, None]
    draft = jnp.where(keep, draft, eot)
    tokens = lax.dynamic_update_slice(tokens, draft, (0, first_gen))

    # ---- verify rounds over [prompt | prefix | draft] ----
    # Round 1 verifies the caller's draft. Later rounds are JACOBI
    # iterations (lookahead decoding): the round's own predictions become
    # the next draft beyond the committed prefix, so a mid-sequence
    # rejection whose tail still matches (e.g. a bf16 argmax tie-flip
    # between the windowed and stepped compute paths) re-commits in one
    # more cheap parallel pass instead of falling back to sequential
    # steps. Each round's committed prefix is exact greedy by induction
    # (committed positions see identical context, so their argmax is
    # deterministic and the prefix only grows).
    w = first_gen + g_eff
    use_ts = _timestamps_enabled(arch, cfg)
    ts_begin = arch.no_timestamps_token_id + 1
    jcol = jnp.arange(g_eff)[None, :]

    def verify_round(tokens, cache, draft, keep):
        logits_w, cache = verify_window(params, arch, tokens[:, :w],
                                        jnp.asarray(0), cache, cross_kvs,
                                        max_len, start=start)
        # biased argmax predictions for the draft positions: conditioning
        # position i = first_gen-1+j predicts draft[:, j]
        lg = logits_w[:, first_gen - 1: w - 1] + sup      # (B, G, V)
        lg = lg.at[:, 0].add(begin_sup)
        if use_ts:
            last_ts = _last_ts_table(draft, ts_begin)[:, :g_eff]  # (B, G)
            pos_arr = first_gen - 1 + jnp.arange(g_eff)
            lg = jax.vmap(
                lambda l, p, lt: _apply_timestamp_rules(
                    l, tokens, p, first_gen, lt, arch, cfg),
                in_axes=(1, 0, 1), out_axes=1)(lg, pos_arr, last_ts)
        pred = jnp.argmax(lg, axis=-1).astype(jnp.int32)   # (B, G)

        # greedy forces EOT after the first emitted EOT: positions after a
        # draft EOT accept IFF the draft also holds EOT there (no pred
        # check — and a pred match with a non-EOT draft token there must
        # NOT accept)
        after_eot = jnp.cumsum((draft == eot).astype(jnp.int32), axis=1) \
            - (draft == eot).astype(jnp.int32) > 0
        ok = jnp.where(after_eot, draft == eot, pred == draft)
        ok = jnp.logical_and(ok, keep)
        # n_acc = longest accepted prefix per row
        n_acc = jnp.argmin(jnp.pad(ok, ((0, 0), (0, 1))), axis=1)
        n_acc = jnp.where(ok.all(axis=1), g_eff, n_acc)    # (B,)
        return cache, pred, n_acc

    for r in range(max(int(rounds), 1)):
        cache, pred, n_acc = verify_round(tokens, cache, draft, keep)
        if r + 1 < rounds:
            # Jacobi update: keep the committed prefix, draft the round's
            # own predictions beyond it (full width — junk-conditioned
            # tail positions just fail the next round's prefix check)
            draft = jnp.where(jcol < n_acc[:, None], draft, pred)
            keep = jnp.ones_like(keep)
            tokens = lax.dynamic_update_slice(tokens, draft, (0, first_gen))

    # ---- continue lockstep greedy from the batch-min divergence ----
    if active is not None:
        n_acc = jnp.where(active, n_acc, g_eff)
    n0 = jnp.min(n_acc)
    pos0 = first_gen - 1 + n0
    # carry state exactly as greedy would hold it at pos0: rows with longer
    # accepts recompute their (identical) tokens, so state is min-relative
    acc_keep = jnp.arange(g_eff)[None, :] < n0
    acc_eot = jnp.logical_and(acc_keep, draft == eot).any(axis=1)
    finished0 = acc_eot
    if active is not None:
        # padding lanes decode nothing: born finished, they emit EOT in
        # the sequential loop and never hold `jnp.all(finished)` open
        finished0 = jnp.logical_or(finished0, ~active)
    last_ts0 = (_last_ts_table(draft, ts_begin)[
        jnp.arange(b), jnp.minimum(n0, g_eff)] if use_ts
        else jnp.zeros((b,), jnp.int32))
    last_ts0 = jnp.asarray(last_ts0, jnp.int32)

    step_fn = functools.partial(decoder_step, params, arch,
                                cross_kvs=cross_kvs, max_len=max_len,
                                start=start, self_pallas=cfg.self_pallas)

    def cond(state):
        return jnp.logical_and(state[2] < limit - 1, ~jnp.all(state[3]))

    def body(state):
        tokens, cache, pos, finished, last_ts = state
        logits, cache = step_fn(tokens[:, pos], pos, cache)
        logits = logits + sup
        logits = jnp.where(pos == first_gen - 1, logits + begin_sup, logits)
        if use_ts:
            logits = _apply_timestamp_rules(logits, tokens, pos, first_gen,
                                            last_ts, arch, cfg)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        nxt = jnp.where(finished, eot, nxt)
        if use_ts:
            last_ts = jnp.where(jnp.logical_and(~finished, nxt >= ts_begin),
                                nxt, last_ts)
        tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        finished = jnp.logical_or(finished, nxt == eot)
        return tokens, cache, pos + 1, finished, last_ts

    state = (tokens, cache, pos0, finished0, last_ts0)
    tokens, _, pos, _, _ = lax.while_loop(cond, body, state)

    # greedy leaves EOT padding beyond its final position; the draft may
    # have left junk there — scrub for bit-exact buffers
    tokens = jnp.where(jnp.arange(max_len)[None, :] > pos, eot, tokens)
    lengths = first_gen + _gen_lengths(tokens, first_gen, pos, eot)
    return tokens, lengths, n_acc


def self_speculative_draft(params: Params, arch: WhisperArch,
                           keep_encoder: int | None = None,
                           keep_decoder: int = 2
                           ) -> tuple[Params, WhisperArch]:
    """Draft = a layer-dropped view of the TARGET itself (self-speculative
    decoding): keep the first `keep_decoder` decoder layers (and optionally
    truncate the encoder). The draft shares the target's weights — zero
    extra HBM beyond its own KV cache — and, with real checkpoints, early
    layers predict the easy tokens well, which is where speculation pays.

    Returns (draft_params, draft_arch) ready for `speculative_decode` /
    `make_speculative_transcribe_fn`. Layer dropping reuses the pruning
    lab's physical surgery (prune/structured.py drop_layers, the
    `experimental_pruning.py:441-505` analog).
    """
    from ..prune.structured import drop_layers

    draft = params
    d_layers = len(params["decoder"]["layers"])
    if keep_decoder < d_layers:
        draft = drop_layers(draft, "decoder",
                            list(range(keep_decoder, d_layers)))
    e_layers = len(params["encoder"]["layers"])
    if keep_encoder is not None and keep_encoder < e_layers:
        draft = drop_layers(draft, "encoder",
                            list(range(keep_encoder, e_layers)))
    arch_d = arch.replace(
        name=f"{arch.name}-selfdraft",
        decoder_layers=min(keep_decoder, d_layers),
        encoder_layers=(e_layers if keep_encoder is None
                        else min(keep_encoder, e_layers)))
    return draft, arch_d
