"""Differential decode-parity matrix vs HF `model.generate()`.

The reference's entire decode loop IS HF generate (`data_utils.py:152`
`model.generate(features)` with the checkpoint's generation_config); its
semantics — SuppressTokens / begin-suppress / forced language+task prefix /
WhisperTimeStampLogitsProcessor / beam search with length penalty /
max-length cutoff — are therefore the oracle for our jittable
`greedy_decode` / `beam_decode`.

These tests build ONE tiny random HF Whisper whose vocab mirrors the real
OpenAI special-token layout (scaled down: text 0..899, <|eot|>=900,
<|sot|>=901, languages 902.., tasks 905/906, <|sop|>=908, <|nospeech|>=909,
<|notimestamps|>=910, timestamps 911..999), drive HF `generate()` with its
REAL logits processors, and assert token equality against our decoders
across the option matrix. The EOT output-embedding row is crafted along the
first principal component of per-utterance logits (same construction as
`test_continuous.py`) so sequences genuinely finish at audio-dependent
lengths — without it, random weights never emit EOT and length-penalty /
cutoff semantics would be vacuously untested.

Intentional divergences from HF (asserted nowhere, documented here):
  * none at the token level for the covered matrix — every combo below is
    an exact-match assertion.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import (GenerationConfig, WhisperConfig,  # noqa: E402
                          WhisperForConditionalGeneration)

import jax.numpy as jnp  # noqa: E402

from openai_whisper_compression_tpu.config import DecodeConfig  # noqa: E402
from openai_whisper_compression_tpu.models import (convert, decode,  # noqa: E402
                                                   whisper)

V = 1000
EOT, SOT = 900, 901
LANG_EN, LANG_DE = 902, 903
TRANSLATE, TRANSCRIBE = 905, 906
SOP = 908            # <|startofprev|>
NOTS = 910           # timestamps are 911..999
N_TEXT = 900


def _make_pair(seed=11, d=64, heads=4, layers=2, src_pos=32, tgt_pos=64):
    """Tiny HF Whisper + converted params with the real special-token layout
    and a crafted EOT row (audio-dependent finish lengths)."""
    torch.manual_seed(seed)
    cfg = WhisperConfig(
        vocab_size=V, num_mel_bins=80, d_model=d,
        encoder_layers=layers, encoder_attention_heads=heads,
        decoder_layers=layers, decoder_attention_heads=heads,
        encoder_ffn_dim=4 * d, decoder_ffn_dim=4 * d,
        max_source_positions=src_pos, max_target_positions=tgt_pos,
        pad_token_id=EOT, bos_token_id=EOT, eos_token_id=EOT,
        decoder_start_token_id=SOT,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    model.proj_out.weight = model.model.decoder.embed_tokens.weight
    from transformers.models.whisper.modeling_whisper import sinusoids
    with torch.no_grad():
        model.model.encoder.embed_positions.weight.copy_(sinusoids(src_pos, d))

    # craft the EOT embedding row (tied with proj_out) from the model's own
    # logit statistics so the EOT-vs-dominant-token gap is audio-dependent
    # and zero-mean across utterances (test_continuous.py construction)
    g = np.random.default_rng(seed)
    mel = g.standard_normal((8, 80, 2 * src_pos)).astype(np.float32)
    ids = torch.tensor([[SOT, LANG_EN, TRANSCRIBE, NOTS]] * len(mel))
    with torch.no_grad():
        logits = model(input_features=torch.from_numpy(mel),
                       decoder_input_ids=ids).logits[:, -1].numpy()
    text = list(range(N_TEXT))
    A = logits[:, text]
    Z = A - A.mean(axis=0, keepdims=True)
    c = np.linalg.svd(Z, full_matrices=False)[2][0]
    m = A.mean(axis=0)
    c = c - ((A @ c).mean() / (A @ m).mean()) * m
    gamma = 2.0 / max(float((A @ c).std()), 1e-9)
    dom = int(np.bincount(logits.argmax(axis=1)).argmax())
    with torch.no_grad():
        emb = model.model.decoder.embed_tokens.weight
        emb[EOT] = emb[dom] + torch.from_numpy(
            gamma * (c[:, None] * emb.numpy()[text]).sum(axis=0))

    gc = GenerationConfig(decoder_start_token_id=SOT, eos_token_id=EOT,
                          pad_token_id=EOT, bos_token_id=EOT,
                          max_length=tgt_pos)
    gc.no_timestamps_token_id = NOTS
    gc.lang_to_id = {"<|en|>": LANG_EN, "<|de|>": LANG_DE}
    gc.task_to_id = {"transcribe": TRANSCRIBE, "translate": TRANSLATE}
    gc.is_multilingual = True
    gc.prev_sot_token_id = SOP
    gc.max_initial_timestamp_index = 50
    model.generation_config = gc

    params = convert.from_hf_state_dict(model.state_dict())
    arch = convert.arch_from_hf_config(cfg).replace(
        no_timestamps_token_id=NOTS)
    assert arch.eos_token_id == EOT and arch.decoder_start_token_id == SOT
    assert arch.language_en_token_id == LANG_EN
    assert arch.task_transcribe_token_id == TRANSCRIBE
    assert arch.task_translate_token_id == TRANSLATE
    return model, params, arch


@pytest.fixture(scope="module")
def pair():
    return _make_pair()


@pytest.fixture(scope="module")
def mel(pair):
    _, _, arch = pair
    g = np.random.default_rng(23)
    return g.standard_normal(
        (3, arch.num_mel_bins, 2 * arch.max_source_positions)
    ).astype(np.float32)


def _cut(row):
    """Normalize a generated-token list: cut at the first EOT (everything
    after is batch padding; HF sometimes strips the EOT itself, sometimes
    keeps it)."""
    row = [int(t) for t in row]
    return row[: row.index(EOT)] if EOT in row else row


def _ours(tokens, lengths, first_gen):
    tokens, lengths = np.asarray(tokens), np.asarray(lengths)
    return [_cut(tokens[bi, first_gen: lengths[bi]])
            for bi in range(tokens.shape[0])]


def _hf(model, mel, **kw):
    """HF generate -> per-row generated-token lists (prefix already stripped
    by WhisperGenerationMixin._postprocess_outputs)."""
    with torch.no_grad():
        out = model.generate(torch.from_numpy(mel), do_sample=False, **kw)
    return [_cut(r) for r in out.tolist()]


def _run_ours(pair, mel, cfg, **kw):
    model, params, arch = pair
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    fn = decode.beam_decode if cfg.beam_size > 1 else decode.greedy_decode
    tokens, lengths = fn(params, arch, enc, cfg, **kw)
    first_gen = len(decode.forced_prefix(arch, cfg))
    if "prompt_tokens" in kw:
        first_gen += kw["prompt_tokens"].shape[1]
    return _ours(tokens, lengths, first_gen)


def _base_cfg(**kw):
    kw.setdefault("max_new_tokens", 24)
    kw.setdefault("language_token_id", LANG_EN)
    kw.setdefault("task_token_id", TRANSCRIBE)
    return DecodeConfig(**kw)


# ---------------------------------------------------------------------------
# greedy matrix
# ---------------------------------------------------------------------------

def test_greedy_plain(pair, mel):
    """[<|sot|>,<|en|>,<|transcribe|>,<|notimestamps|>] prefix, greedy."""
    model = pair[0]
    ours = _run_ours(pair, mel, _base_cfg())
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=1,
             max_new_tokens=24)
    assert ours == hf


def test_greedy_translate_prefix(pair, mel):
    """task=translate swaps the forced task token (905)."""
    model = pair[0]
    ours = _run_ours(pair, mel, _base_cfg(task_token_id=TRANSLATE))
    hf = _hf(model, mel, language="en", task="translate", num_beams=1,
             max_new_tokens=24)
    assert ours == hf


def test_greedy_suppress_tokens(pair, mel):
    """SuppressTokensLogitsProcessor parity: ban the tokens greedy picks."""
    model = pair[0]
    base = _run_ours(pair, mel, _base_cfg())
    banned = sorted({t for r in base for t in r[:2]} - {EOT})[:3]
    assert banned, "fixture produced no text tokens to ban"
    ours = _run_ours(pair, mel, _base_cfg(suppress_tokens=tuple(banned)))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=1,
             max_new_tokens=24, suppress_tokens=banned)
    assert ours == hf
    for row in ours:
        assert not set(banned) & set(row)


def test_greedy_begin_suppress(pair, mel):
    """SuppressTokensAtBeginLogitsProcessor: first generated token only."""
    model = pair[0]
    base = _run_ours(pair, mel, _base_cfg())
    banned = sorted({r[0] for r in base if r} - {EOT})
    assert banned, "fixture produced no first tokens to ban"
    ours = _run_ours(pair, mel, _base_cfg(begin_suppress_tokens=tuple(banned)))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=1,
             max_new_tokens=24, begin_suppress_tokens=banned)
    assert ours == hf
    for row in ours:
        assert not row or row[0] not in banned


def test_greedy_max_length_cutoff(pair, mel):
    """max_new_tokens truncation point matches HF exactly."""
    model = pair[0]
    ours = _run_ours(pair, mel, _base_cfg(max_new_tokens=6))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=1,
             max_new_tokens=6)
    assert ours == hf
    assert max(len(r) for r in ours) <= 6


def test_greedy_timestamps(pair, mel):
    """WhisperTimeStampLogitsProcessor parity: pairs, non-decreasing,
    forced initial timestamp, sum-prob rule."""
    model = pair[0]
    ours = _run_ours(pair, mel, _base_cfg(notimestamps=False))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=1,
             max_new_tokens=24, return_timestamps=True)
    assert ours == hf
    for row in ours:
        assert not row or row[0] >= NOTS + 1, \
            "first generated token must be a timestamp"


def test_greedy_timestamps_suppress(pair, mel):
    """Timestamps + suppress compose in the same order as HF's processor
    list (suppress first, timestamp rules after)."""
    model = pair[0]
    base = _run_ours(pair, mel, _base_cfg(notimestamps=False))
    banned = sorted({t for r in base for t in r if t < N_TEXT})[:2]
    if not banned:
        pytest.skip("timestamp-mode outputs contained no text tokens")
    ours = _run_ours(pair, mel, _base_cfg(notimestamps=False,
                                          suppress_tokens=tuple(banned)))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=1,
             max_new_tokens=24, return_timestamps=True,
             suppress_tokens=banned)
    assert ours == hf


def test_greedy_prompt_conditioning(pair, mel):
    """HF prompt_ids (condition_on_prev): [<|sop|>, *prompt] before the
    forced prefix, positions starting at 0."""
    model = pair[0]
    prompt = [7, 13, 42]
    pt = jnp.asarray([[SOP] + prompt] * mel.shape[0], jnp.int32)
    ours = _run_ours(pair, mel, _base_cfg(), prompt_tokens=pt)
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=1,
             max_new_tokens=24, prompt_ids=torch.tensor([SOP] + prompt))
    assert ours == hf


# ---------------------------------------------------------------------------
# beam matrix
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("lp", [1.0, 0.6, 2.0])
def test_beam5_length_penalty(pair, mel, lp):
    """Beam-5 with HF length_penalty semantics; the crafted EOT makes beams
    finish at different lengths so the penalty actually reranks."""
    model = pair[0]
    ours = _run_ours(pair, mel, _base_cfg(beam_size=5, length_penalty=lp))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=5,
             max_new_tokens=24, length_penalty=lp)
    assert ours == hf


def test_beam5_timestamps(pair, mel):
    model = pair[0]
    ours = _run_ours(pair, mel, _base_cfg(beam_size=5, notimestamps=False))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=5,
             max_new_tokens=24, return_timestamps=True)
    assert ours == hf


def test_beam5_suppress(pair, mel):
    model = pair[0]
    base = _run_ours(pair, mel, _base_cfg(beam_size=5))
    banned = sorted({r[0] for r in base if r} - {EOT})
    assert banned, "fixture produced no first tokens to ban"
    ours = _run_ours(pair, mel, _base_cfg(beam_size=5,
                                          suppress_tokens=tuple(banned)))
    hf = _hf(model, mel, language="en", task="transcribe", num_beams=5,
             max_new_tokens=24, suppress_tokens=banned)
    assert ours == hf


# ---------------------------------------------------------------------------
# seek-loop window: segment slicing + seek advance vs HF _retrieve_segment
# ---------------------------------------------------------------------------

def _hf_retrieve(seq, frames):
    """Call HF's long-form segment cutter directly on one window."""
    from transformers.models.whisper.generation_whisper import (
        WhisperGenerationMixin)

    segs, offset = WhisperGenerationMixin._retrieve_segment(
        seek_sequence=torch.tensor(seq, dtype=torch.long),
        seek_outputs=[{}],
        time_offset=torch.tensor([0.0], dtype=torch.float64),
        timestamp_begin=NOTS + 1,
        seek_num_frames=torch.tensor([frames]),
        time_precision=0.02,
        time_precision_features=0.01,
        input_stride=2,
        prev_idx=0, idx=0,
        return_token_timestamps=False,
        decoder_input_ids=torch.zeros((1, 4), dtype=torch.long),
    )
    out = []
    for s in segs:
        toks = [int(t) for t in s["tokens"].tolist()]
        text = [t for t in toks if t < NOTS + 1]
        if text:  # ours drops text-empty segments (documented divergence)
            out.append((round(float(s["start"]), 6),
                        round(float(s["end"]), 6), text))
    return out, int(offset)


def test_seek_window_matches_hf_retrieve_segment(pair):
    """Our segments_from_tokens must cut segments and advance the seek
    exactly like HF's `_retrieve_segment` (the reference's long-form loop)
    across random token streams: pair endings, single-timestamp endings,
    no-timestamp windows, timestamp-only windows."""
    from openai_whisper_compression_tpu.evaluation.longform import (
        segments_from_tokens)

    _, _, arch = pair
    frames = 3000  # full 30 s window, in mel frames
    window_s = frames * 0.01
    g = np.random.default_rng(5)
    n_checked = 0
    for trial in range(300):
        n = int(g.integers(1, 18))
        seq = []
        for _ in range(n):
            r = g.random()
            if r < 0.45:
                seq.append(int(g.integers(0, N_TEXT)))
            else:
                seq.append(int(g.integers(NOTS + 1, V)))
        hf_segs, hf_offset = _hf_retrieve(seq, frames)
        ours, seek = segments_from_tokens(arch, np.asarray(seq))
        ours_norm = [(round(s["start"], 6),
                      round(window_s if s["end"] is None else s["end"], 6),
                      s["tokens"]) for s in ours]
        hf_norm = [(a, window_s if (b is None) else b, t)
                   for a, b, t in hf_segs]
        assert ours_norm == hf_norm, f"trial {trial}: {seq}"
        ours_advance_s = window_s if seek is None else seek
        assert abs(ours_advance_s - hf_offset * 0.01) < 1e-6, \
            f"trial {trial}: seek {ours_advance_s} vs {hf_offset * 0.01} " \
            f"({seq})"
        n_checked += 1
    assert n_checked == 300


# ---------------------------------------------------------------------------
# crafted-EOT sanity: the matrix above is only meaningful if sequences
# actually finish at ragged, audio-dependent lengths
# ---------------------------------------------------------------------------

def test_fixture_is_ragged(pair, mel):
    ours = _run_ours(pair, mel, _base_cfg())
    lens = [len(r) for r in ours]
    assert len(set(lens)) >= 2, f"crafted EOT lost raggedness: {lens}"
    assert min(lens) < 24, "no sequence finished before the cutoff"
