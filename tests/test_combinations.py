"""Cross-feature interaction tests: compression transforms × decode features
composed the way production configs actually stack them."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu import load_model, quantize
from openai_whisper_compression_tpu.config import DecodeConfig, EvalConfig
from openai_whisper_compression_tpu.models import decode
from openai_whisper_compression_tpu.models.fuse import fuse_qkv
from openai_whisper_compression_tpu.models.whisper import encode


@pytest.fixture(scope="module")
def model():
    return load_model("test2l")


@pytest.fixture(scope="module")
def mel(model):
    _, arch = model
    g = np.random.default_rng(7)
    return jnp.asarray(g.standard_normal((2, arch.num_mel_bins, 64)),
                       jnp.float32)


def _cfg(**kw):
    return DecodeConfig(max_new_tokens=6, language_token_id=None,
                        task_token_id=None, notimestamps=False, **kw)


def test_full_stack_decode(model, mel):
    """recipe-prune -> int8 -> qkv-fuse -> int8 self-KV + merge — the maximal
    compression stack decodes identically with/without fusion."""
    from openai_whisper_compression_tpu.prune.recipe import apply_recipe

    params, arch = model
    stack = quantize(apply_recipe(params, arch), "int8")
    fused = fuse_qkv(stack)
    enc = encode(stack, arch, mel, merge_at=1)
    cfg = _cfg(kv_int8=True)
    t0, l0 = decode.greedy_decode(stack, arch, enc, cfg)
    t1, l1 = decode.greedy_decode(fused, arch, enc, cfg)
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))


def test_fused_prompt_conditioning(model, mel):
    """qkv fusion composes with prompt windows (start-masked attention)."""
    params, arch = model
    fused = fuse_qkv(params)
    enc = encode(params, arch, mel)
    pw = 8
    empty = jnp.full((2, pw), arch.eos_token_id, jnp.int32)
    zero = jnp.zeros((2,), jnp.int32)
    t_plain, l_plain = decode.greedy_decode(params, arch, enc, _cfg())
    t_f, l_f = decode.greedy_decode(fused, arch, enc, _cfg(),
                                    prompt_tokens=empty, prompt_lens=zero)
    a = np.asarray(t_plain)[0, 1: int(l_plain[0])]
    b = np.asarray(t_f)[0, pw + 1: int(l_f[0])]
    np.testing.assert_array_equal(a, b)


def test_structured_pruned_beam(model, mel):
    """physically head-pruned + int8 + beam-3 (shared cross-KV with per-layer
    head counts) runs and stays self-consistent with beam=1."""
    from openai_whisper_compression_tpu.prune.structured import prune_heads_by_l1

    params, arch = model
    pq = quantize(prune_heads_by_l1(params, arch, 0.5), "int8")
    enc = encode(pq, arch, mel)
    t_g, _ = decode.greedy_decode(pq, arch, enc, _cfg())
    t_b1, _ = decode.beam_decode(pq, arch, enc, _cfg(beam_size=1))
    np.testing.assert_array_equal(np.asarray(t_g), np.asarray(t_b1))
    t_b3, l_b3 = decode.beam_decode(pq, arch, enc, _cfg(beam_size=3))
    assert t_b3.shape[0] == 2 and int(np.asarray(l_b3).min()) >= 1


def test_harness_with_merge_and_quant(model):
    """make_transcribe_fn(merge_at) over a quantized+fused model, end to end
    through the eval harness."""
    from openai_whisper_compression_tpu.evaluation import harness
    from openai_whisper_compression_tpu.evaluation.data import synthetic_dataset
    from openai_whisper_compression_tpu.evaluation.tokenizer import WordTokenizer

    params, arch = model
    compressed = fuse_qkv(quantize(params, "int8"))
    fn = harness.make_transcribe_fn(arch, _cfg(), fast_mel=True, merge_at=1)
    data = synthetic_dataset(4, seed=2, min_dur=0.4, max_dur=0.8)
    tok = WordTokenizer(arch.vocab_size, special_start=997)
    scores, records = harness.evaluate_model(
        compressed, arch, data, tok,
        eval_cfg=EvalConfig(batch_size=2, warmup_batches=0),
        decode_cfg=_cfg(), transcribe_fn=fn)
    assert scores["num_samples"] == 4
    assert all(r["hypothesis"] is not None for r in records)


def test_storage_roundtrip_of_fused(model, tmp_path):
    """fused+quantized pytrees survive the compressed storage formats."""
    from openai_whisper_compression_tpu.storage import formats

    params, arch = model
    fused = fuse_qkv(quantize(params, "int8"))
    res = formats.verify_roundtrip(fused, str(tmp_path / "f.zip"), "sparse_zip")
    assert res["ok"], res["mismatches"][:4]
    loaded = formats.load_sparse_zip(str(tmp_path / "f.zip"))
    assert "qkv" in loaded["decoder"]["layers"][0]["attn"]
