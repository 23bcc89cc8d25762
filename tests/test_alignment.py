"""Word-level timestamp alignment (models/alignment.py): DTW properties,
synthetic-attention recovery, word grouping, and an end-to-end run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import alignment, params as P, whisper


def test_dtw_diagonal():
    """A strongly diagonal similarity matrix aligns ~diagonally."""
    n, m = 10, 40
    sim = np.zeros((n, m))
    for i in range(n):
        sim[i, i * 4: i * 4 + 4] = 1.0
    ti, fi = alignment.dtw_path(-sim)
    # monotonic, covers all tokens and frames
    assert (np.diff(ti) >= 0).all() and (np.diff(fi) >= 0).all()
    assert ti[0] == 0 and fi[0] == 0
    assert ti[-1] == n - 1 and fi[-1] == m - 1
    # each token's first frame lands on its block
    for tok in range(n):
        f = fi[np.flatnonzero(ti == tok)[0]]
        assert abs(int(f) - tok * 4) <= 1


def test_dtw_path_steps():
    rng = np.random.default_rng(0)
    cost = rng.random((7, 19))
    ti, fi = alignment.dtw_path(cost)
    steps = set(zip(np.diff(ti).tolist(), np.diff(fi).tolist()))
    assert steps <= {(0, 1), (1, 0), (1, 1)}


def test_median_filter():
    x = np.asarray([[1.0, 100.0, 1.0, 1.0, 1.0]])
    out = alignment._median_filter(x, 3)
    assert out[0, 1] == 1.0  # spike removed
    assert out.shape == x.shape


def test_word_grouping():
    class Tok:
        def decode(self, ids):
            return {1: " hello", 2: "world", 3: " there"}.get(ids[0], "")

    times = np.asarray([[0.0, 0.2], [0.2, 0.5], [0.5, 0.9]])
    words = alignment.word_timestamps(Tok(), [1, 2, 3], times)
    assert [w["word"] for w in words] == ["helloworld", "there"]
    assert words[0]["start"] == 0.0 and words[0]["end"] == 0.5
    assert words[1]["start"] == 0.5 and words[1]["end"] == 0.9


def test_find_alignment_end_to_end():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    rng = np.random.default_rng(1)
    enc = jnp.asarray(rng.standard_normal(
        (1, arch.max_source_positions, arch.d_model)) * 0.1, jnp.float32)
    tokens = np.asarray([arch.decoder_start_token_id, 5, 9, 13, 21],
                        np.int32)
    tt = alignment.find_alignment(params, arch, enc, tokens)
    assert tt.shape == (len(tokens), 2)
    assert (tt[:, 0] <= tt[:, 1]).all()
    assert (np.diff(tt[:, 0]) >= 0).all()         # monotonic starts
    max_t = arch.max_source_positions * alignment.FRAME_SECONDS
    assert (tt >= 0).all() and (tt <= max_t + 1e-6).all()


def test_transcribe_seek_word_timestamps():
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.evaluation.longform import (
        transcribe_seek)
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        WordTokenizer)

    arch = ARCHS["test2l"].replace(no_timestamps_token_id=900)
    params = P.init_params(arch, jax.random.PRNGKey(21))
    g = np.random.default_rng(3)
    n_win = 2 * arch.max_source_positions * 160
    wav = (g.standard_normal(int(1.5 * n_win)) * 0.1).astype(np.float32)
    tok = WordTokenizer(arch.vocab_size, special_start=897)
    cfg = DecodeConfig(max_new_tokens=10, language_token_id=None,
                       task_token_id=None, notimestamps=False,
                       max_initial_timestamp_index=20)
    res = transcribe_seek(params, arch, wav, tok, cfg, word_timestamps=True)
    assert "words" in res
    for w in res["words"]:
        assert w["end"] >= w["start"] >= 0
        assert w["start"] <= res["audio_seconds"] + 30.0
        assert isinstance(w["word"], str) and w["word"]


def test_cross_attention_weights_shape_and_softmax():
    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    rng = np.random.default_rng(2)
    enc = jnp.asarray(rng.standard_normal(
        (2, arch.max_source_positions, arch.d_model)) * 0.1, jnp.float32)
    toks = jnp.asarray(rng.integers(0, 900, (2, 4)), jnp.int32)
    w = np.asarray(alignment.cross_attention_weights(params, arch, toks, enc))
    assert w.shape == (arch.decoder_layers, 2, arch.decoder_heads, 4,
                       arch.max_source_positions)
    np.testing.assert_allclose(w.sum(-1), 1.0, atol=1e-4)


def test_merge_punctuations_append():
    words = [{"word": "hello", "start": 0.0, "end": 0.5},
             {"word": ",", "start": 0.5, "end": 0.6},
             {"word": "world", "start": 0.6, "end": 1.0},
             {"word": "!", "start": 1.0, "end": 1.1}]
    out = alignment.merge_punctuations(words)
    assert out == [{"word": "hello,", "start": 0.0, "end": 0.6},
                   {"word": "world!", "start": 0.6, "end": 1.1}]


def test_merge_punctuations_prepend():
    words = [{"word": "¿", "start": 0.0, "end": 0.1},
             {"word": "qué", "start": 0.1, "end": 0.4},
             {"word": "?", "start": 0.4, "end": 0.5}]
    out = alignment.merge_punctuations(words)
    assert out == [{"word": "¿qué?", "start": 0.0, "end": 0.5}]


def test_merge_punctuations_consecutive_and_orphan():
    # consecutive openers accumulate; a trailing orphan opener is kept
    words = [{"word": '"', "start": 0.0, "end": 0.1},
             {"word": "(", "start": 0.1, "end": 0.2},
             {"word": "hi", "start": 0.2, "end": 0.5},
             {"word": "-", "start": 0.6, "end": 0.7}]
    out = alignment.merge_punctuations(words)
    assert out[0] == {"word": '"(hi', "start": 0.0, "end": 0.5}
    assert out[1]["word"] == "-"


def test_merge_punctuations_no_op_on_plain_words():
    words = [{"word": "a", "start": 0.0, "end": 0.1},
             {"word": "b", "start": 0.1, "end": 0.2}]
    assert alignment.merge_punctuations(words) == words


def test_word_probabilities_from_token_logprobs():
    class SpacedTok:  # BPE-like: a leading space starts a new word
        special_start = 900

        def decode(self, ids):
            return "".join({10: " he", 11: "llo", 12: " there"}[i]
                           for i in ids)

    tok = SpacedTok()
    ids = [950, 10, 11, 12]  # special, then "hello" (2 tokens) + "there"
    times = np.asarray([[0.0, 0.1], [0.1, 0.5], [0.5, 0.9], [0.9, 1.3]])
    lps = np.log(np.asarray([1.0, 0.8, 0.2, 0.5]))
    words = alignment.word_timestamps(tok, ids, times, token_logprobs=lps)
    assert [w["word"] for w in words] == ["hello", "there"]
    # word probability = exp(mean token logprob): sqrt(0.8*0.2), then 0.5
    np.testing.assert_allclose(words[0]["probability"],
                               (0.8 * 0.2) ** 0.5, rtol=1e-6)
    np.testing.assert_allclose(words[1]["probability"], 0.5, rtol=1e-6)
    # without logprobs, no probability key
    words2 = alignment.word_timestamps(tok, ids, times)
    assert "probability" not in words2[0]
