"""Jittable autoregressive decoding (greedy + beam) with persistent KV cache.

TPU-native replacement for HF `model.generate()` (the reference's hot loop,
`data_utils.py:152`): a `lax.while_loop` over decode steps with static
shapes, early exit when every sequence has emitted EOT, suppress-token
masking, and a forced decoder prefix — all inside one jit compilation.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..config import DecodeConfig, WhisperArch
from . import cache as kv_cache
from .whisper import (NEG_INF, attention, cross_attention, embed_tokens,
                      layer_norm, linear, merge_heads, mlp, precompute_cross_kv,
                      project_out, qkv_project, _num_heads)

Params = dict[str, Any]


def forced_prefix(arch: WhisperArch, cfg: DecodeConfig) -> list[int]:
    """[<|sot|>, lang, task, <|notimestamps|>] — the prompt HF builds from
    `forced_decoder_ids` (reference relies on the model's generation config)."""
    ids = [arch.decoder_start_token_id]
    if arch.multilingual:  # `.en` vocabs have no language/task tokens
        # auto: real multilingual OpenAI vocabs (51865/51866) get
        # <|en|> + <|transcribe|> (per-arch ids — v3 shifts them +1);
        # smaller/custom vocabs omit, like the old ids-filtered defaults.
        real_vocab = arch.vocab_size >= 51865
        lang = cfg.language_token_id
        if lang == "auto":
            lang = arch.language_en_token_id if real_vocab else None
        task = cfg.task_token_id
        if task == "auto":
            task = arch.task_transcribe_token_id if real_vocab else None
        if lang is not None:
            ids.append(lang)
        if task is not None:
            ids.append(task)
    if cfg.notimestamps and arch.no_timestamps_token_id < arch.vocab_size:
        ids.append(arch.no_timestamps_token_id)
    return [i for i in ids if i < arch.vocab_size]


def _suppress_bias(arch: WhisperArch, ids: tuple[int, ...]) -> np.ndarray:
    bias = np.zeros((arch.vocab_size,), np.float32)
    for i in ids:
        if 0 <= i < arch.vocab_size:
            bias[i] = NEG_INF
    return bias


# ---------------------------------------------------------------------------
# Single decode step through the cache
# ---------------------------------------------------------------------------

def decoder_step(params: Params, arch: WhisperArch, tok: jax.Array,
                 pos: jax.Array, cache: list, cross_kvs: list,
                 max_len: int,
                 start: jax.Array | None = None,
                 beam: int = 1,
                 self_pallas: bool = True) -> tuple[jax.Array, list]:
    """tok: (B,) int32 current tokens; pos: scalar step index.

    start: optional (B,) first valid cache position per sequence (prompt
    left-padding for prompt-conditioned decoding is masked out).
    beam>1: tok rows are B*beam flattened beams sharing cross_kvs entries of
    batch size B (cross-KV streamed once per utterance, not per beam).
    Returns (logits (B, V), updated cache)."""
    dec = params["decoder"]
    b = tok.shape[0]
    x = embed_tokens(dec, tok)[:, None, :]  # (B, 1, d)
    if start is None:
        x = x + lax.dynamic_slice_in_dim(dec["pos"], pos, 1,
                                         axis=0)[None].astype(x.dtype)
    else:
        # positions are sequence-relative: the (left-padded) prompt's first
        # valid token sits at position 0, like OpenAI's prompt conditioning
        pidx = jnp.maximum(pos - start, 0)  # (B,)
        x = x + dec["pos"][pidx][:, None, :].astype(x.dtype)

    # mask over cache positions: attend to start <= idx <= pos
    idx = jnp.arange(max_len)
    valid = (idx <= pos)[None, :]
    if start is not None:
        valid = jnp.logical_and(valid, idx[None, :] >= start[:, None])
    mask = jnp.where(valid, 0.0, NEG_INF).astype(jnp.float32)[:, None, None, :]

    from ..ops.linear import _on_tpu

    use_sas = self_pallas and _on_tpu()

    new_cache = []
    for i, layer in enumerate(dec["layers"]):
        p = layer["attn"]
        h = _num_heads(p, arch.head_dim)
        hs = layer_norm(x, layer["attn_ln"])
        q, k, v = qkv_project(p, hs, h)
        if use_sas and "k_scale" not in cache[i]:
            # fully fused Pallas step (ops.self_attention_step): cache-row
            # write + masked attention in ONE kernel over ALIASED cache
            # buffers — replaces the per-layer dynamic_update_slice pair the
            # while-loop scheduler materialized as full-cache copies.
            from ..ops.self_attention_step import decode_self_attention_update

            dh = arch.head_dim
            bh = b * h
            qf = (q.reshape(bh, dh) * (dh ** -0.5)).astype(q.dtype)
            start_bh = None
            if start is not None:
                start_bh = jnp.repeat(start, h)
            o_flat, kc, vc = decode_self_attention_update(
                qf, k.reshape(bh, dh), v.reshape(bh, dh),
                cache[i]["k"].reshape(bh, max_len, dh),
                cache[i]["v"].reshape(bh, max_len, dh),
                pos, start=start_bh)
            new_cache.append({"k": kc.reshape(b, h, max_len, dh),
                              "v": vc.reshape(b, h, max_len, dh)})
            o_merged = o_flat.reshape(b, 1, h * dh)
        elif use_sas:
            # int8 cache: fused in-kernel row quantize + write + attend
            # (per-position dequant scales folded into the vectors)
            from ..ops.self_attention_step import (
                decode_self_attention_update_int8)

            dh = arch.head_dim
            bh = b * h
            qf = (q.reshape(bh, dh) * (dh ** -0.5)).astype(q.dtype)
            start_bh = None
            if start is not None:
                start_bh = jnp.repeat(start, h)
            o_flat, kc, ksc, vc, vsc = decode_self_attention_update_int8(
                qf, k.reshape(bh, dh), v.reshape(bh, dh),
                cache[i]["k"].reshape(bh, max_len, dh),
                cache[i]["v"].reshape(bh, max_len, dh),
                cache[i]["k_scale"].reshape(bh, max_len),
                cache[i]["v_scale"].reshape(bh, max_len),
                pos, start=start_bh)
            new_cache.append({
                "k": kc.reshape(b, h, max_len, dh),
                "v": vc.reshape(b, h, max_len, dh),
                "k_scale": ksc.reshape(b, h, max_len),
                "v_scale": vsc.reshape(b, h, max_len)})
            o_merged = o_flat.reshape(b, 1, h * dh)
        else:
            entry = kv_cache.update(cache[i], k, v, pos)
            new_cache.append(entry)
            k_all, v_all = kv_cache.read(entry, q.dtype)
            o = attention(q, k_all, v_all, mask)
            o_merged = merge_heads(o)
        x = x + linear(o_merged, p["o"]["w"], p["o"].get("b"))

        hs_c = layer_norm(x, layer["cross_ln"])
        if beam > 1:
            from .whisper import grouped_cross_attention

            x = x + grouped_cross_attention(layer["cross"], hs_c,
                                            cross_kvs[i], arch.head_dim, beam)
        else:
            x = x + cross_attention(layer["cross"], hs_c, cross_kvs[i],
                                    arch.head_dim)
        x = x + mlp(layer, layer_norm(x, layer["mlp_ln"]))

    x = layer_norm(x, dec["ln"])
    logits = project_out(dec, x)[:, 0, :]  # (B, V)
    return logits, new_cache


def prefill(params: Params, arch: WhisperArch, tokens: jax.Array,
            cache: list, cross_kvs: list,
            start: jax.Array | None = None) -> list:
    """Run the (B, P) [prompt +] forced-prefix window through the decoder in
    ONE batched pass, filling cache positions [0, P). Replaces P sequential
    `decoder_step` calls (the HF-generate prefill the reference gets for
    free inside `model.generate`, `data_utils.py:152`) — for long-form
    prompt conditioning (P up to ~228) this is ~P× fewer passes.

    start: optional (B,) first valid position (left-padded prompts).

    With an int8 self-KV cache (kv_int8), prefill attends to the EXACT k/v
    of the window while writing the quantized values into the cache — the
    standard prefill semantics (higher fidelity than stepping through the
    quantized cache, which is what the pre-batched implementation did);
    generated tokens can differ marginally from sequential stepping in that
    mode.

    Returns the updated cache."""
    from .whisper import CrossKV

    dec = params["decoder"]
    b, p_len = tokens.shape
    x = embed_tokens(dec, tokens)  # (B, P, d)
    if start is None:
        x = x + dec["pos"][:p_len][None].astype(x.dtype)
    else:
        pidx = jnp.maximum(jnp.arange(p_len)[None, :] - start[:, None], 0)
        x = x + dec["pos"][pidx].astype(x.dtype)

    iq = jnp.arange(p_len)
    ok = iq[None, None, :] <= iq[None, :, None]          # causal (1, P, P)
    if start is not None:
        ok = jnp.logical_and(ok, iq[None, None, :] >= start[:, None, None])
    mask = jnp.where(ok, 0.0, NEG_INF).astype(jnp.float32)[:, None, :, :]

    new_cache = []
    for i, layer in enumerate(dec["layers"]):
        p = layer["attn"]
        h = _num_heads(p, arch.head_dim)
        hs = layer_norm(x, layer["attn_ln"])
        q, k, v = qkv_project(p, hs, h)
        new_cache.append(kv_cache.update(cache[i], k, v, 0))
        o = attention(q, k, v, mask)
        x = x + linear(merge_heads(o), p["o"]["w"], p["o"].get("b"))

        hs_c = layer_norm(x, layer["cross_ln"])
        if isinstance(cross_kvs[i], CrossKV):
            x = x + _cross_window_t(layer["cross"], hs_c, cross_kvs[i],
                                    arch.head_dim)
        else:
            x = x + cross_attention(layer["cross"], hs_c, cross_kvs[i],
                                    arch.head_dim)
        x = x + mlp(layer, layer_norm(x, layer["mlp_ln"]))
    return new_cache


def _cross_window_t(p: Params, x: jax.Array, kv, head_dim: int) -> jax.Array:
    """Multi-position (B, P, d) cross-attention over transposed K/V: the
    P query positions share each (b, h) K/V entry, so this reuses the
    beam-grouped fused kernel with P in the beam slot."""
    from .whisper import grouped_cross_t_apply

    b, p_len, _ = x.shape
    h = _num_heads(p, head_dim)
    dh = head_dim
    q = linear(x, p["q"]["w"], p["q"].get("b"))          # (B, P, H*Dh)
    qg = (q.reshape(b, p_len, h, dh).transpose(0, 2, 1, 3)
          .reshape(b * h, p_len, dh) * (dh ** -0.5)).astype(q.dtype)
    o = grouped_cross_t_apply(qg, kv)
    o = (o.reshape(b, h, p_len, dh).transpose(0, 2, 1, 3)
         .reshape(b, p_len, h * dh)).astype(x.dtype)
    return linear(o, p["o"]["w"], p["o"].get("b"))


# ---------------------------------------------------------------------------
# Timestamp rules (OpenAI ApplyTimestampRules semantics, jittable)
# ---------------------------------------------------------------------------

def _timestamps_enabled(arch: WhisperArch, cfg: DecodeConfig) -> bool:
    """Timestamp rules apply when the prefix omits <|notimestamps|> and the
    vocab actually contains timestamp tokens (ids > no_timestamps)."""
    return (cfg.timestamp_rules and not cfg.notimestamps
            and arch.no_timestamps_token_id + 1 < arch.vocab_size)


def _apply_timestamp_rules(logits: jax.Array, tokens: jax.Array,
                           pos: jax.Array, first_gen: int, last_ts: jax.Array,
                           arch: WhisperArch,
                           cfg: DecodeConfig) -> jax.Array:
    """Bias `logits` (B, V) for the token at position pos+1 following
    OpenAI's rules (whisper/decoding.py ApplyTimestampRules; the reference
    inherits them through HF `generate`'s timestamp processor):

    1. <|notimestamps|> is never sampled.
    2. After a LONE timestamp (one whose predecessor is a generated
       non-timestamp), only a timestamp or EOT/special may follow — pairs.
       After a completed pair — and after the INITIAL forced timestamp,
       which HF/OpenAI treat identically ("len(seq) < 2" counts as
       penultimate-was-timestamp) — text must follow.
    3. Timestamps never decrease; once a pair completes (or after the
       initial timestamp) the next timestamp must be STRICTLY greater
       ("avoid emitting <|0.00|> again"). A lone timestamp's pair-mate may
       repeat the same value.
    4. The first generated token is a timestamp, bounded by
       max_initial_timestamp_index.
    5. If total timestamp probability beats the best text token, everything
       below timestamp_begin (including EOT and specials) is suppressed.

    Pinned token-exact against HF's WhisperTimeStampLogitsProcessor by
    tests/test_hf_generate_parity.py (greedy + beam).

    tokens: (B, L) buffer; last_ts: (B,) last emitted timestamp id, 0 when
    none emitted yet.
    """
    ts_begin = arch.no_timestamps_token_id + 1
    vocab = arch.vocab_size
    ids = jnp.arange(vocab)
    is_ts_id = ids >= ts_begin
    eot = arch.eos_token_id

    logits = logits.at[:, arch.no_timestamps_token_id].add(NEG_INF)  # rule 1

    last = tokens[:, pos]
    penult_idx = jnp.maximum(pos - 1, 0)
    penult = tokens[:, penult_idx]
    last_is_ts = jnp.logical_and(pos >= first_gen, last >= ts_begin)
    # fewer than two generated tokens counts as penultimate-was-timestamp
    # (HF WhisperTimeStampLogitsProcessor: `len(seq) < 2 or ...`)
    penult_is_ts = jnp.logical_or(pos - 1 < first_gen, penult >= ts_begin)

    # rule 2: lone timestamp -> suppress plain text (ids < EOT; EOT and the
    #         specials above it stay allowed, matching `scores[:eos] = -inf`);
    #         completed pair / initial ts -> suppress timestamps
    force_ts = jnp.logical_and(last_is_ts, ~penult_is_ts)[:, None]
    block_ts = jnp.logical_and(last_is_ts, penult_is_ts)[:, None]
    logits = logits + jnp.where(
        jnp.logical_and(force_ts, (ids < eot)[None, :]), NEG_INF, 0.0)
    logits = logits + jnp.where(jnp.logical_and(block_ts, is_ts_id[None, :]),
                                NEG_INF, 0.0)

    # rule 3: suppress ts ids < threshold; threshold is the last emitted
    # timestamp while its pair is open, last+1 otherwise; no-op before the
    # first timestamp (last_ts == 0)
    has_ts = last_ts >= ts_begin
    thresh = jnp.where(has_ts,
                       jnp.where(force_ts[:, 0], last_ts, last_ts + 1), 0)
    logits = logits + jnp.where(
        jnp.logical_and(is_ts_id[None, :], ids[None, :] < thresh[:, None]),
        NEG_INF, 0.0)

    # rule 4: first generated token must be an (early) timestamp
    first = (pos == first_gen - 1)
    max_init = min(ts_begin + cfg.max_initial_timestamp_index, vocab - 1)
    init_bad = jnp.logical_or(~is_ts_id, ids > max_init)[None, :]
    logits = logits + jnp.where(jnp.logical_and(first, init_bad), NEG_INF, 0.0)

    # rule 5: aggregated timestamp probability vs best sub-timestamp token;
    # when timestamps win, EVERYTHING below ts_begin (EOT included) is
    # suppressed, exactly like `scores[:, :timestamp_begin] = -inf`
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    ts_logp = jax.nn.logsumexp(
        jnp.where(is_ts_id[None, :], logp, NEG_INF), axis=-1)   # (B,)
    max_text = jnp.max(jnp.where(is_ts_id[None, :], NEG_INF, logp), axis=-1)
    ts_wins = (ts_logp > max_text)[:, None]
    logits = logits + jnp.where(
        jnp.logical_and(ts_wins, (~is_ts_id)[None, :]), NEG_INF, 0.0)
    return logits


def timestamp_token_to_seconds(arch: WhisperArch, token: int) -> float:
    """<|t|> token id -> seconds (0.02 s per step, OpenAI convention)."""
    return (token - (arch.no_timestamps_token_id + 1)) * 0.02


# ---------------------------------------------------------------------------
# Greedy decode
# ---------------------------------------------------------------------------

def greedy_decode(params: Params, arch: WhisperArch, enc_out: jax.Array,
                  cfg: DecodeConfig | None = None,
                  max_len: int | None = None,
                  prompt_tokens: jax.Array | None = None,
                  prompt_lens: jax.Array | None = None,
                  sample_key: jax.Array | None = None,
                  temperature: jax.Array | float = 0.0,
                  return_logprobs: bool = False,
                  return_token_logprobs: bool = False):
    """Batched greedy decode.

    Optional prompt conditioning (long-form `condition_on_previous_text`):
    `prompt_tokens` (B, P) holds right-aligned prompt ids; left padding is
    masked out of attention via `prompt_lens` (B,). The forced prefix and
    generation follow at positions >= P.

    sample_key + temperature: temperature sampling (OpenAI transcribe's
    fallback ladder, whisper/transcribe.py role — the reference inherits
    HF greedy defaults and has no fallback). `temperature` is a TRACED
    scalar so one compiled program serves the whole (0.0, 0.2, ..., 1.0)
    ladder; at 0.0 the argmax branch is selected exactly (bit-identical to
    the no-key path).

    return_logprobs=True additionally returns per-sequence mean generated-
    token logprob (the fallback quality gate; computed in-loop from the
    already-materialized logits).

    return_token_logprobs=True instead appends the full (B, max_len) f32
    per-position logprob trace (0.0 at prompt/prefix/padding positions;
    trace[i] is the logprob of tokens[:, i]) — the word-probability input
    for hallucination detection (OpenAI whisper/timing.py word probs).

    Returns (tokens (B, max_len) — [prompt +] prefix + generated, padded
    with EOT after stop; lengths (B,) — valid tokens incl. prompt window,
    prefix and final EOT[, avg_logprob (B,) f32][, token_logprobs
    (B, max_len) f32]).
    """
    cfg = cfg or DecodeConfig()
    b = enc_out.shape[0]
    eot = arch.eos_token_id

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
    if cfg.cross_pallas:
        from .whisper import precompute_cross_kv_t

        bits = 4 if cfg.cross_kv_int4 else (8 if cfg.cross_kv_int8 else 16)
        cross_kvs = precompute_cross_kv_t(params, arch, enc_out, bits=bits)
    else:
        if cfg.cross_kv_int4:
            raise ValueError("cross_kv_int4 requires cross_pallas=True "
                             "(only the transposed-KV layout packs nibbles)")
        cross_kvs = precompute_cross_kv(params, arch, enc_out,
                                        int8=cfg.cross_kv_int8)
    cache = kv_cache.init_cache(params, arch, b, max_len,
                                dtype=enc_out.dtype, int8=cfg.kv_int8)

    tokens = jnp.full((b, max_len), eot, jnp.int32)
    start = None
    if pw:
        tokens = tokens.at[:, :pw].set(prompt_tokens.astype(jnp.int32))
        if prompt_lens is None:
            prompt_lens = jnp.full((b,), pw, jnp.int32)
        start = (pw - prompt_lens).astype(jnp.int32)
    tokens = tokens.at[:, pw: pw + p_len].set(
        jnp.asarray(prefix, jnp.int32)[None])

    step_fn = functools.partial(decoder_step, params, arch,
                                cross_kvs=cross_kvs, max_len=max_len,
                                start=start, self_pallas=cfg.self_pallas)

    # Prefill prompt window + forced prefix in one batched decoder pass.
    if pw + p_len > 1:
        cache = prefill(params, arch, tokens[:, : pw + p_len - 1], cache,
                        cross_kvs, start=start)

    first_gen = pw + p_len  # index of the first generated token
    limit = min(max_len, first_gen + cfg.max_new_tokens)
    use_ts = _timestamps_enabled(arch, cfg)
    ts_begin = arch.no_timestamps_token_id + 1

    temp = jnp.asarray(temperature, jnp.float32)

    def cond(state):
        return jnp.logical_and(state[2] < limit - 1, ~jnp.all(state[3]))

    def body(state):
        tokens, cache, pos, finished, last_ts, sum_lp, lp_trace = state
        logits, cache = step_fn(tokens[:, pos], pos, cache)
        logits = logits + sup
        logits = jnp.where(pos == first_gen - 1, logits + begin_sup, logits)
        if use_ts:
            logits = _apply_timestamp_rules(logits, tokens, pos, first_gen,
                                            last_ts, arch, cfg)
        greedy = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        if sample_key is not None:
            sampled = jax.random.categorical(
                jax.random.fold_in(sample_key, pos),
                logits.astype(jnp.float32) / jnp.maximum(temp, 1e-6),
                axis=-1).astype(jnp.int32)
            nxt = jnp.where(temp > 0.0, sampled, greedy)
        else:
            nxt = greedy
        nxt = jnp.where(finished, eot, nxt)
        if return_logprobs or return_token_logprobs:
            lp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
            tok_lp = jnp.take_along_axis(lp, nxt[:, None], axis=-1)[:, 0]
            tok_lp = jnp.where(finished, 0.0, tok_lp)
            sum_lp = sum_lp + tok_lp
            if return_token_logprobs:
                lp_trace = lax.dynamic_update_slice(
                    lp_trace, tok_lp[:, None], (0, pos + 1))
        if use_ts:
            last_ts = jnp.where(jnp.logical_and(~finished, nxt >= ts_begin),
                                nxt, last_ts)
        tokens = lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        finished = jnp.logical_or(finished, nxt == eot)
        return tokens, cache, pos + 1, finished, last_ts, sum_lp, lp_trace

    lp_trace0 = jnp.zeros((b, max_len if return_token_logprobs else 1),
                          jnp.float32)  # size-1 dummy keeps the carry static
    state = (tokens, cache, jnp.asarray(first_gen - 1), jnp.zeros((b,), bool),
             jnp.zeros((b,), jnp.int32), jnp.zeros((b,), jnp.float32),
             lp_trace0)
    tokens, _, pos, _, _, sum_lp, lp_trace = lax.while_loop(cond, body, state)
    lengths = first_gen + _gen_lengths(tokens, first_gen, pos, eot)
    out = (tokens, lengths)
    if return_logprobs:
        n_gen = jnp.maximum(lengths - first_gen, 1).astype(jnp.float32)
        out = out + (sum_lp / n_gen,)
    if return_token_logprobs:
        out = out + (lp_trace,)
    return out


def _auto_cache_len(arch: WhisperArch, p_len: int, cfg: DecodeConfig) -> int:
    """Size the KV cache for the requested decode length (64-aligned) rather
    than always max_target_positions: a 25-token decode then reads a 64-slot
    cache instead of 448 — ~7x less self-attention cache bandwidth per step."""
    need = p_len + cfg.max_new_tokens + 1
    return min(arch.max_target_positions, -(-need // 64) * 64)


def _gen_lengths(tokens: jax.Array, p_len: int, pos: jax.Array,
                 eot: int) -> jax.Array:
    """Generated-token count per sequence: up to and including an EOT the
    model actually emitted, excluding init-padding EOTs past the loop's final
    position `pos` (last written index)."""
    gen = tokens[:, p_len:]
    gen_count = pos + 1 - p_len  # tokens actually written by the loop
    is_eot = gen == eot
    first_eot = jnp.argmax(is_eot, axis=1)
    emitted = jnp.logical_and(jnp.any(is_eot, axis=1), first_eot < gen_count)
    return jnp.where(emitted, first_eot + 1, gen_count)


def transcribe_tokens(params: Params, arch: WhisperArch, mel: jax.Array,
                      cfg: DecodeConfig | None = None) -> tuple[jax.Array, jax.Array]:
    """mel (B, n_mels, 3000) -> (tokens, lengths). Encoder + greedy decode;
    jit this whole function for the production path."""
    from .whisper import encode

    return greedy_decode(params, arch, encode(params, arch, mel), cfg)


# ---------------------------------------------------------------------------
# Beam search (shape-static, batch*beam flattened)
# ---------------------------------------------------------------------------

def beam_decode(params: Params, arch: WhisperArch, enc_out: jax.Array,
                cfg: DecodeConfig | None = None,
                max_len: int | None = None,
                prompt_tokens: jax.Array | None = None,
                prompt_lens: jax.Array | None = None
                ) -> tuple[jax.Array, jax.Array]:
    """Batched beam search; returns best hypothesis per batch element.

    Shape-static: all K beams advance every step; finished beams are frozen
    by forcing EOT with probability one. Scores use sum-logprob with length
    penalty `(len)^alpha` applied at selection (HF `length_penalty` semantics).

    Supports prompt conditioning (`prompt_tokens` (B, P) right-aligned +
    `prompt_lens`, as in `greedy_decode`) and the OpenAI timestamp rules —
    the prompt+prefix window is prefilled ONCE at batch B (all beams are
    identical until the first generated token) and the caches tiled to B·K.
    """
    cfg = cfg or DecodeConfig()
    beam = cfg.beam_size
    if beam <= 1:
        return greedy_decode(params, arch, enc_out, cfg, max_len,
                             prompt_tokens=prompt_tokens,
                             prompt_lens=prompt_lens)
    b, src, d = enc_out.shape
    eot = arch.eos_token_id
    vocab = arch.vocab_size

    prefix = forced_prefix(arch, cfg)
    p_len = len(prefix)
    pw = 0 if prompt_tokens is None else prompt_tokens.shape[1]
    max_len = max_len or _auto_cache_len(arch, pw + p_len, cfg)
    sup = jnp.asarray(_suppress_bias(arch, tuple(cfg.suppress_tokens)))
    begin_sup = jnp.asarray(_suppress_bias(arch, tuple(cfg.begin_suppress_tokens)))

    if cfg.cross_kv_pool > 1 or cfg.cross_kv_merge > 0:
        from .merge import merge_encoder_tokens

        enc_out = merge_encoder_tokens(enc_out, pool=cfg.cross_kv_pool,
                                       merge_r=cfg.cross_kv_merge)
    # Cross-KV stays at batch size B; beams share entries via grouped
    # cross-attention in decoder_step (no B*K replication in HBM).
    if cfg.cross_pallas:
        from .whisper import precompute_cross_kv_t

        bits = 4 if cfg.cross_kv_int4 else (8 if cfg.cross_kv_int8 else 16)
        cross_kvs = precompute_cross_kv_t(params, arch, enc_out, bits=bits)
    else:
        if cfg.cross_kv_int4:
            raise ValueError("cross_kv_int4 requires cross_pallas=True "
                             "(only the transposed-KV layout packs nibbles)")
        cross_kvs = precompute_cross_kv(params, arch, enc_out,
                                        int8=cfg.cross_kv_int8)

    # Prefill the [prompt +] forced prefix at batch B, then tile to B*K.
    cache_b = kv_cache.init_cache(params, arch, b, max_len,
                                  dtype=enc_out.dtype, int8=cfg.kv_int8)
    tokens_b = jnp.full((b, max_len), eot, jnp.int32)
    start_b = None
    if pw:
        tokens_b = tokens_b.at[:, :pw].set(prompt_tokens.astype(jnp.int32))
        if prompt_lens is None:
            prompt_lens = jnp.full((b,), pw, jnp.int32)
        start_b = (pw - prompt_lens).astype(jnp.int32)
    tokens_b = tokens_b.at[:, pw: pw + p_len].set(
        jnp.asarray(prefix, jnp.int32)[None])
    first_gen = pw + p_len
    if first_gen > 1:
        cache_b = prefill(params, arch, tokens_b[:, : first_gen - 1],
                          cache_b, cross_kvs, start=start_b)

    cache = jax.tree.map(lambda x: jnp.repeat(x, beam, axis=0), cache_b)
    tokens = jnp.repeat(tokens_b, beam, axis=0)
    start = None if start_b is None else jnp.repeat(start_b, beam)

    step_fn = functools.partial(decoder_step, params, arch,
                                cross_kvs=cross_kvs, max_len=max_len,
                                start=start, beam=beam,
                                self_pallas=cfg.self_pallas)

    # scores: beam 0 starts at 0, others at -inf so step 1 fans out from beam 0
    scores = jnp.tile(jnp.asarray([0.0] + [NEG_INF] * (beam - 1), jnp.float32), (b,))
    finished = jnp.zeros((b * beam,), bool)
    limit = min(max_len, first_gen + cfg.max_new_tokens)
    use_ts = _timestamps_enabled(arch, cfg)
    ts_begin = arch.no_timestamps_token_id + 1

    def gather_beams(tree, idx):
        """Reindex the (B*K, ...) leading axis by per-batch beam indices
        idx (B, K)."""
        flat = (jnp.arange(b)[:, None] * beam + idx).reshape(-1)
        return jax.tree.map(lambda x: x[flat], tree)

    def cond(state):
        _, _, pos, finished, _, _ = state
        return jnp.logical_and(pos < limit - 1, ~jnp.all(finished))

    def body(state):
        tokens, cache, pos, finished, scores, last_ts = state
        logits, cache = step_fn(tokens[:, pos], pos, cache)
        logits = logits + sup
        logits = jnp.where(pos == first_gen - 1, logits + begin_sup, logits)
        if use_ts:
            logits = _apply_timestamp_rules(logits, tokens, pos, first_gen,
                                            last_ts, arch, cfg)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        # finished beams: only EOT allowed, at zero cost (freeze the score)
        frozen = jnp.full((vocab,), NEG_INF, jnp.float32).at[eot].set(0.0)
        logp = jnp.where(finished[:, None], frozen[None], logp)

        cand = scores[:, None] + logp                     # (B*K, V)
        cand = cand.reshape(b, beam * vocab)
        top_scores, top_idx = lax.top_k(cand, beam)       # (B, K)
        src_beam = top_idx // vocab                       # (B, K)
        tok_next = (top_idx % vocab).astype(jnp.int32)    # (B, K)

        tokens, cache, finished, last_ts = gather_beams(
            (tokens, cache, finished, last_ts), src_beam)
        nxt = tok_next.reshape(-1)
        tokens = lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, pos + 1))
        if use_ts:
            last_ts = jnp.where(jnp.logical_and(~finished, nxt >= ts_begin),
                                nxt, last_ts)
        finished = jnp.logical_or(finished, nxt == eot)
        return tokens, cache, pos + 1, finished, top_scores.reshape(-1), last_ts

    state = (tokens, cache, jnp.asarray(first_gen - 1), finished, scores,
             jnp.zeros((b * beam,), jnp.int32))
    tokens, _, pos, finished, scores, _ = lax.while_loop(cond, body, state)

    # pick best beam per batch with length penalty
    gen_len = _gen_lengths(tokens, first_gen, pos, eot).astype(jnp.float32)
    adj = scores / jnp.power(gen_len, cfg.length_penalty)
    best = jnp.argmax(adj.reshape(b, beam), axis=1)       # (B,)
    flat = jnp.arange(b) * beam + best
    lengths = first_gen + _gen_lengths(tokens, first_gen, pos, eot)
    return tokens[flat], lengths[flat]


# ---------------------------------------------------------------------------
# Language identification (OpenAI whisper.detect_language parity)
# ---------------------------------------------------------------------------

# Multilingual Whisper language tokens occupy the contiguous id range
# [<|startoftranscript|>+1, <|translate|>): 99 languages for v2, 100 for
# large-v3. Derived from the arch's special ids so test vocabs work too.
# The 5 ids between <|translate|> and <|notimestamps|> are always
# translate, transcribe, startoflm, startofprev, nospeech — so
# <|translate|> = no_timestamps - 5 for every multilingual vocab.
def _language_token_range(arch: WhisperArch) -> tuple[int, int]:
    lo = arch.decoder_start_token_id + 1
    hi = min(arch.no_timestamps_token_id - 5, arch.vocab_size)  # < task ids
    if hi <= lo:
        raise ValueError(f"vocab of {arch.name} has no language-token range")
    return lo, hi


def detect_language(params: Params, arch: WhisperArch, enc_out: jax.Array,
                    lang_range: tuple[int, int] | None = None
                    ) -> tuple[jax.Array, jax.Array]:
    """One decoder step from <|startoftranscript|>, softmaxed over the
    language tokens only (OpenAI whisper/decoding.py detect_language; the
    reference inherits language='en' defaults through HF generate and never
    exposes this).

    Returns (probs (B, n_langs) over the language-token range,
    top_token (B,) absolute token ids). jit-compatible.
    """
    if not arch.multilingual:
        raise ValueError(
            f"{arch.name} is English-only: its vocab has no language tokens")
    lo, hi = lang_range or _language_token_range(arch)
    b = enc_out.shape[0]
    max_len = 64
    cache = kv_cache.init_cache(params, arch, b, max_len,
                                dtype=enc_out.dtype)
    cross_kvs = precompute_cross_kv(params, arch, enc_out)
    sot = jnp.full((b,), arch.decoder_start_token_id, jnp.int32)
    logits, _ = decoder_step(params, arch, sot, jnp.asarray(0), cache,
                             cross_kvs, max_len, self_pallas=False)
    lang_logits = logits[:, lo:hi].astype(jnp.float32)
    probs = jax.nn.softmax(lang_logits, axis=-1)
    top = jnp.argmax(lang_logits, axis=-1) + lo
    return probs, top


def no_speech_prob(params: Params, arch: WhisperArch,
                   enc_out: jax.Array) -> jax.Array:
    """P(<|nospeech|>) from the <|startoftranscript|> step — OpenAI's
    silence gate (whisper DecodingResult.no_speech_prob; combined with the
    avg-logprob threshold in `models.fallback`). Returns (B,) f32.
    jit-compatible."""
    b = enc_out.shape[0]
    cache = kv_cache.init_cache(params, arch, b, 8, dtype=enc_out.dtype)
    cross_kvs = precompute_cross_kv(params, arch, enc_out)
    sot = jnp.full((b,), arch.decoder_start_token_id, jnp.int32)
    logits, _ = decoder_step(params, arch, sot, jnp.asarray(0), cache,
                             cross_kvs, 8, self_pallas=False)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    return probs[:, arch.no_speech_token_id]
