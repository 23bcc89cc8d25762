"""Numerical parity vs HF torch Whisper (random weights, built in-process).

The reference's correctness rests entirely on HF `WhisperForConditionalGeneration`
(`model_utils.py:116-123`); these tests pin our JAX model to the same
numerics so downstream WER comparisons are meaningful.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
from transformers import WhisperConfig, WhisperForConditionalGeneration  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from openai_whisper_compression_tpu.models import convert, whisper  # noqa: E402


def make_hf_pair(seed=0, d=64, heads=4, layers=2, vocab=1000, mels=80,
                 src_pos=32, tgt_pos=32):
    torch.manual_seed(seed)
    cfg = WhisperConfig(
        vocab_size=vocab, num_mel_bins=mels, d_model=d,
        encoder_layers=layers, encoder_attention_heads=heads,
        decoder_layers=layers, decoder_attention_heads=heads,
        encoder_ffn_dim=4 * d, decoder_ffn_dim=4 * d,
        max_source_positions=src_pos, max_target_positions=tgt_pos,
        # keep special ids inside the tiny vocab
        pad_token_id=vocab - 4, bos_token_id=vocab - 3,
        eos_token_id=vocab - 3, decoder_start_token_id=vocab - 2,
    )
    model = WhisperForConditionalGeneration(cfg).eval()
    # random (non-zero) weights everywhere for a meaningful comparison
    with torch.no_grad():
        for p in model.parameters():
            p.copy_(torch.randn_like(p) * 0.05)
    # re-tie proj_out and restore sinusoidal encoder positions
    model.proj_out.weight = model.model.decoder.embed_tokens.weight
    from transformers.models.whisper.modeling_whisper import sinusoids
    with torch.no_grad():
        model.model.encoder.embed_positions.weight.copy_(
            sinusoids(src_pos, d))
    params = convert.from_hf_state_dict(model.state_dict())
    arch = convert.arch_from_hf_config(cfg)
    return model, params, arch


@pytest.fixture(scope="module")
def hf_pair():
    return make_hf_pair()


def test_encoder_parity(hf_pair, rng):
    model, params, arch = hf_pair
    t_mel = 2 * arch.max_source_positions  # conv stride-2
    mel = rng.standard_normal((2, arch.num_mel_bins, t_mel)).astype(np.float32)

    ours = np.asarray(whisper.encode(params, arch, jnp.asarray(mel)))
    with torch.no_grad():
        theirs = model.model.encoder(torch.from_numpy(mel)).last_hidden_state.numpy()

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=2e-3)


def test_decoder_logits_parity(hf_pair, rng):
    model, params, arch = hf_pair
    t_mel = 2 * arch.max_source_positions
    mel = rng.standard_normal((2, arch.num_mel_bins, t_mel)).astype(np.float32)
    tokens = rng.integers(0, arch.vocab_size, size=(2, 7)).astype(np.int64)

    enc = whisper.encode(params, arch, jnp.asarray(mel))
    ours = np.asarray(whisper.decode_logits(params, arch, jnp.asarray(tokens), enc))
    with torch.no_grad():
        theirs = model(
            input_features=torch.from_numpy(mel),
            decoder_input_ids=torch.from_numpy(tokens),
        ).logits.numpy()

    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-3)


def test_loss_grads_finite(hf_pair, rng):
    import jax

    _, params, arch = hf_pair
    mel = jnp.asarray(rng.standard_normal((1, arch.num_mel_bins, 64)), jnp.float32)
    tokens = jnp.asarray(rng.integers(0, arch.vocab_size, (1, 5)))
    labels = jnp.asarray(rng.integers(0, arch.vocab_size, (1, 5)))
    loss, grads = jax.value_and_grad(whisper.nll_loss)(params, arch, mel, tokens, labels)
    assert np.isfinite(float(loss))
    flat = jax.tree.leaves(grads)
    assert all(np.all(np.isfinite(np.asarray(g))) for g in flat)


def test_param_utilities(hf_pair):
    from openai_whisper_compression_tpu.models import params as P

    _, params, _ = hf_pair
    n = P.leaf_count(params)
    assert n > 0
    names = dict(P.named_leaves(params))
    assert "decoder.layers.0.attn.q.w" in names
    assert "encoder.conv1.w" in names
    leaf = P.get_leaf(params, "decoder.layers.0.attn.q.w")
    assert leaf.shape[0] == leaf.shape[1]
    # k_proj has no bias in Whisper
    assert "decoder.layers.0.attn.k.b" not in names


def test_parity_nonsquare_dims():
    """Parity with asymmetric head_dim (d=96, 6 heads -> head_dim 16) to
    catch reshape/transpose bugs square dims would hide."""
    model, params, arch = make_hf_pair(seed=9, d=96, heads=6, layers=2,
                                       vocab=500, mels=80, src_pos=24,
                                       tgt_pos=16)
    g = np.random.default_rng(11)
    mel = g.standard_normal((1, 80, 48)).astype(np.float32)
    tokens = g.integers(0, 500, (1, 5)).astype(np.int64)
    enc = whisper.encode(params, arch, jnp.asarray(mel))
    ours = np.asarray(whisper.decode_logits(params, arch,
                                            jnp.asarray(tokens), enc))
    with torch.no_grad():
        theirs = model(input_features=torch.from_numpy(mel),
                       decoder_input_ids=torch.from_numpy(tokens)).logits.numpy()
    np.testing.assert_allclose(ours, theirs, atol=5e-4, rtol=5e-3)


def test_token_merging_shapes():
    _, params, arch = make_hf_pair(seed=1)
    g = np.random.default_rng(0)
    mel = jnp.asarray(g.standard_normal((1, 80, 64)), jnp.float32)
    full = whisper.encode(params, arch, mel)
    merged = whisper.encode(params, arch, mel, merge_at=1, merge_factor=2)
    assert merged.shape[1] == full.shape[1] // 2
    # decode runs against the merged encoder states
    from openai_whisper_compression_tpu.config import DecodeConfig
    from openai_whisper_compression_tpu.models import decode as D

    t, l = D.greedy_decode(params, arch, merged,
                           DecodeConfig(max_new_tokens=4,
                                        language_token_id=None,
                                        task_token_id=None,
                                        notimestamps=False))
    assert t.shape[0] == 1


def test_hf_export_roundtrip(hf_pair):
    """pytree -> HF state dict -> pytree is exact, and the exported dict
    loads into a torch model that reproduces our logits."""
    model, params, arch = hf_pair
    sd = convert.to_hf_state_dict(params)
    back = convert.from_hf_state_dict(sd)
    from openai_whisper_compression_tpu.models.params import named_leaves

    a, b = dict(named_leaves(params)), dict(named_leaves(back))
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    # load exported dict into the torch model: must be accepted exactly
    model2 = WhisperForConditionalGeneration(model.config)
    model2.load_state_dict({k: torch.from_numpy(np.array(v))
                            for k, v in sd.items()})
    g = np.random.default_rng(3)
    mel = g.standard_normal(
        (1, arch.num_mel_bins, 2 * arch.max_source_positions)).astype(np.float32)
    toks = g.integers(0, arch.vocab_size, (1, 4)).astype(np.int64)
    with torch.no_grad():
        l1 = model(input_features=torch.from_numpy(mel),
                   decoder_input_ids=torch.from_numpy(toks)).logits.numpy()
        l2 = model2(input_features=torch.from_numpy(mel),
                    decoder_input_ids=torch.from_numpy(toks)).logits.numpy()
    np.testing.assert_allclose(l1, l2, atol=1e-6)


def test_export_compressed_pipeline(hf_pair):
    """quantized+fused model -> dequantize -> unfuse -> HF export loads."""
    from openai_whisper_compression_tpu.models.fuse import fuse_qkv, unfuse_qkv
    from openai_whisper_compression_tpu.quant.api import (dequantize_params,
                                                          quantize_params)

    model, params, arch = hf_pair
    compressed = fuse_qkv(quantize_params(params, "int8"))
    exported = convert.to_hf_state_dict(
        unfuse_qkv(dequantize_params(compressed)))
    model2 = WhisperForConditionalGeneration(model.config)
    model2.load_state_dict({k: torch.from_numpy(np.array(v))
                            for k, v in exported.items()})
    # exported weights carry int8 quantization error vs originals, bounded
    w_orig = model.model.encoder.layers[0].fc1.weight.detach().numpy()
    w_exp = model2.model.encoder.layers[0].fc1.weight.detach().numpy()
    rel = np.linalg.norm(w_orig - w_exp) / np.linalg.norm(w_orig)
    assert 0 < rel < 0.01


def test_fast_gelu_encoder_accuracy(hf_pair):
    """tanh-approximate encoder GELU stays within ~1e-2 relative of the
    exact-erf encoder output (opt-in speed/parity trade)."""
    import jax.numpy as jnp

    _, params, arch = hf_pair
    g = np.random.default_rng(5)
    mel = jnp.asarray(g.standard_normal(
        (2, arch.num_mel_bins, 2 * arch.max_source_positions)), jnp.float32)
    exact = np.asarray(whisper.encode(params, arch, mel))
    fast = np.asarray(whisper.encode(params, arch, mel, fast_gelu=True))
    rel = np.abs(fast - exact).max() / max(np.abs(exact).max(), 1e-9)
    assert 0 < rel < 1e-2
