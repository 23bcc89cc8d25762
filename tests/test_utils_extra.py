"""EDA utilities, sensitivity plots, profiling tools, QTensor TP sharding."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import params as P


def test_eda(tmp_path):
    from openai_whisper_compression_tpu.evaluation.data import synthetic_dataset
    from openai_whisper_compression_tpu.evaluation import eda

    data = synthetic_dataset(6, seed=0, min_dur=1.0, max_dur=3.0)
    stats = eda.examine_dataset(data)
    assert stats["num_samples"] == 6
    assert 1.0 <= stats["duration_s"]["mean"] <= 3.0
    assert stats["words_per_utterance"]["max"] >= stats["words_per_utterance"]["min"]

    paths = eda.plot_dataset_distributions(data, str(tmp_path))
    paths += eda.plot_sample(data[0], str(tmp_path))
    assert all(os.path.exists(p) for p in paths)

    # headless playback stand-in: valid 16-bit PCM WAV round-trip
    import wave

    wav_path = eda.export_sample(data[0], str(tmp_path))
    with wave.open(wav_path, "rb") as f:
        assert f.getframerate() == 16000 and f.getnchannels() == 1
        assert f.getnframes() == len(data[0].audio)


def test_sensitivity_plots(tmp_path):
    from openai_whisper_compression_tpu.sensitivity.plots import plot_sensitivity

    agg = {"by_category": {"encoder_ffn": 0.4, "decoder_ffn": 0.9,
                           "cross_attention": 0.2},
           "by_layer": {"encoder.0": 0.1, "encoder.1": 0.5,
                        "decoder.0": 0.9, "decoder.1": 0.3}}
    paths = plot_sensitivity(agg, str(tmp_path))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)


def test_profiling_tools():
    from openai_whisper_compression_tpu.utils import profiling

    def f(x):
        return (x @ x).sum()

    x = jnp.ones((128, 128))
    t = profiling.timed(f, x, iters=2)
    assert t["median_s"] > 0
    costs = profiling.cost_analysis(f, x)
    assert costs.get("flops", 0) >= 2 * 128 ** 3 * 0.9
    perf = profiling.flops_per_second(f, x, iters=2)
    assert perf["achieved_tflops"] > 0


def test_qtensor_tp_sharding():
    from openai_whisper_compression_tpu.ops.qtensor import QTensor
    from openai_whisper_compression_tpu.parallel import mesh as mesh_lib
    from openai_whisper_compression_tpu.quant import api as quant_api

    arch = ARCHS["test2l"]
    params = quant_api.quantize_params(
        P.init_params(arch, jax.random.PRNGKey(0)), "int8")
    mesh = mesh_lib.make_mesh(dp=2, tp=4)
    sharded = mesh_lib.shard_params(params, mesh)
    q = P.get_leaf(sharded, "encoder.layers.0.attn.q.w")
    assert isinstance(q, QTensor)
    # column-parallel: data sharded on out dim, scale follows
    assert q.data.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    assert q.scale.sharding.spec == jax.sharding.PartitionSpec(None, "tp")
    o = P.get_leaf(sharded, "encoder.layers.0.attn.o.w")
    assert o.data.sharding.spec == jax.sharding.PartitionSpec("tp", None)

    # sharded quantized forward still runs under jit (XLA dequant path on CPU)
    from openai_whisper_compression_tpu.models.whisper import encode

    mel = jax.device_put(jnp.zeros((2, arch.num_mel_bins, 64)),
                         mesh_lib.batch_sharding(mesh))
    out = jax.jit(lambda p, m: encode(p, arch, m))(sharded, mel)
    assert out.shape == (2, 32, arch.d_model)


def test_arch_registry_families():
    """Every official OpenAI family member is registered with its published
    dimensions (reference hardcodes `openai/whisper-small` only,
    `config.py:16`; large-v3-turbo = v3 encoder + distilled 4-layer
    decoder)."""
    a = ARCHS["large-v3-turbo"]
    assert (a.encoder_layers, a.decoder_layers) == (32, 4)
    assert (a.num_mel_bins, a.vocab_size) == (128, 51866)
    assert a.no_timestamps_token_id == 50364  # v3 specials shift +1
    assert ARCHS["large"].d_model == ARCHS["large-v2"].d_model == 1280
    d3 = ARCHS["distil-large-v3"]
    assert (d3.encoder_layers, d3.decoder_layers) == (32, 2)
    assert d3.no_timestamps_token_id == 50364
    assert ARCHS["distil-small.en"].decoder_layers == 4
    assert not ARCHS["distil-medium.en"].multilingual
    for name, arch in ARCHS.items():
        assert arch.name == name
        assert arch.d_model % arch.encoder_heads == 0


def test_asymmetric_decoder_forward():
    """Turbo-style arch (decoder_layers != encoder_layers) initializes,
    encodes, and greedy-decodes at test scale."""
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.models import decode, whisper

    arch = ARCHS["test2l"].replace(name="test-turbo", decoder_layers=1)
    params = P.init_params(arch, jax.random.PRNGKey(3))
    assert len(params["decoder"]["layers"]) == 1
    assert len(params["encoder"]["layers"]) == 2
    mel = jnp.zeros((2, arch.num_mel_bins, 2 * arch.max_source_positions))
    cfg = DecodeConfig(max_new_tokens=4, self_pallas=False,
                       cross_pallas=False)
    enc_out = whisper.encode(params, arch, mel)
    toks, lens = decode.greedy_decode(params, arch, enc_out, cfg)
    assert toks.shape[0] == 2 and lens.shape == (2,)
    logits = jax.jit(
        lambda p, m, t: whisper.forward(p, arch, m, t)
    )(params, mel, jnp.asarray([[998, 1], [998, 2]]))
    assert logits.shape == (2, 2, arch.vocab_size)


def test_english_only_archs():
    """`.en` checkpoints: GPT-2 vocab, no language/task tokens — the forced
    prefix is [<|sot|>, <|notimestamps|>] and detect_language refuses
    (OpenAI whisper tokenizer get_decoder_prompt_ids parity)."""
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.models import decode

    en = ARCHS["small.en"]
    assert (en.vocab_size, en.multilingual) == (51864, False)
    assert (en.eos_token_id, en.decoder_start_token_id,
            en.no_timestamps_token_id) == (50256, 50257, 50362)
    assert en.d_model == ARCHS["small"].d_model
    # default cfg carries multilingual ids; the .en prefix must drop them
    assert decode.forced_prefix(en, DecodeConfig()) == [50257, 50362]
    assert decode.forced_prefix(ARCHS["small"], DecodeConfig()) == \
        [50258, 50259, 50359, 50363]
    # v3 vocab shifts task/notimestamps ids +1: "auto" must track the arch
    # (a hardcoded 50359 would inject <|translate|> here)
    assert decode.forced_prefix(ARCHS["large-v3"], DecodeConfig()) == \
        [50258, 50259, 50360, 50364]
    assert decode.forced_prefix(ARCHS["large-v3-turbo"], DecodeConfig()) == \
        [50258, 50259, 50360, 50364]
    # custom/test vocabs: auto omits lang/task (same as the old id filter)
    assert decode.forced_prefix(ARCHS["test2l"], DecodeConfig()) == [998, 999]

    arch = ARCHS["test2l"].replace(multilingual=False)
    params = P.init_params(arch, jax.random.PRNGKey(0))
    enc = jnp.zeros((1, arch.max_source_positions // 2, arch.d_model))
    with pytest.raises(ValueError, match="English-only"):
        decode.detect_language(params, arch, enc)
    # greedy still runs with the shortened prefix
    cfg = DecodeConfig(max_new_tokens=3, self_pallas=False,
                       cross_pallas=False)
    toks, lens = decode.greedy_decode(params, arch, enc, cfg)
    assert np.asarray(toks)[0, 0] == arch.decoder_start_token_id


def test_language_and_task_token_ids():
    """Language tokens sit at sot+1+index in LANGUAGES order; task ids are
    fixed offsets below <|notimestamps|> — all v2/v3-layout aware."""
    from openai_whisper_compression_tpu.config import (
        LANGUAGES, language_token_id)

    small = ARCHS["small"]
    assert language_token_id(small, "en") == 50259
    assert language_token_id(small, "de") == 50261
    assert language_token_id(small, 12345) == 12345       # int passthrough
    assert small.task_translate_token_id == 50358
    assert small.task_transcribe_token_id == 50359
    v3 = ARCHS["large-v3"]
    assert language_token_id(v3, "yue") == 50358          # v3-only language
    assert v3.task_translate_token_id == 50359
    assert v3.task_transcribe_token_id == 50360
    import pytest as _pt
    with _pt.raises(ValueError):
        language_token_id(small, "yue")                   # v2 lacks yue
    with _pt.raises(ValueError):
        language_token_id(ARCHS["small.en"], "de")        # English-only
    with _pt.raises(ValueError):
        language_token_id(small, "xx")
    assert len(LANGUAGES) == 100 and LANGUAGES[-1] == "yue"


def test_transcribe_task_translate_prefix():
    """task='translate' + language override reach the forced prefix."""
    import dataclasses

    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.models import decode

    arch = ARCHS["small"]
    cfg = dataclasses.replace(DecodeConfig(),
                              task_token_id=arch.task_translate_token_id,
                              language_token_id=50261)  # <|de|>
    assert decode.forced_prefix(arch, cfg) == [50258, 50261, 50358, 50363]


def test_language_code_roundtrip():
    from openai_whisper_compression_tpu.config import (
        language_code, language_token_id)

    small = ARCHS["small"]
    for c in ("en", "de", "ja"):
        assert language_code(small, language_token_id(small, c)) == c
    with pytest.raises(ValueError):
        language_code(small, 50258)  # sot is not a language token


def test_compile_cache_wiring(tmp_path, monkeypatch):
    from openai_whisper_compression_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache)

    prev = getattr(jax.config, "jax_compilation_cache_dir", None)
    try:
        d = enable_persistent_compilation_cache(str(tmp_path / "cc"))
        assert d and os.path.isdir(d)
        # first-configurer wins: a bare enable() (what `import ...cli`
        # does) must keep the already-configured dir, not re-point it
        assert enable_persistent_compilation_cache() == d
        monkeypatch.setenv("OWC_NO_COMPILE_CACHE", "1")
        assert enable_persistent_compilation_cache() is None
    finally:
        if prev:   # restore the suite's conftest cache configuration
            monkeypatch.delenv("OWC_NO_COMPILE_CACHE", raising=False)
            enable_persistent_compilation_cache(prev, min_secs=0.1)
