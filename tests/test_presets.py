"""Headline-preset tests: every transform runs on the tiny arch; the CLI
presets command works end-to-end."""

import pytest

from openai_whisper_compression_tpu.sweep.presets import BASELINE_PRESETS, PRESETS


def test_all_presets_build_on_tiny_arch():
    import jax.numpy as jnp

    from openai_whisper_compression_tpu.models.params import get_leaf, size_in_mb

    sizes = {}
    for preset in BASELINE_PRESETS:
        params, arch, dcfg = preset.build(arch_override="test2l")
        sizes[preset.name] = size_in_mb(params)
        assert arch.name == "test2l"
    # compression presets actually shrink
    assert sizes["small_int8"] < sizes["tiny_fp32_greedy"]
    assert sizes["medium_int4_kv8"] < sizes["small_int8"]
    assert sizes["largev3_structured50_int8"] < sizes["tiny_fp32_greedy"]

    # structured preset physically halved heads + FFN
    params, arch, _ = PRESETS["largev3_structured50_int8"].build(
        arch_override="test2l")
    qkv = get_leaf(params, "encoder.layers.0.attn.q.w")
    assert qkv.shape[1] == 2 * arch.head_dim  # 4 -> 2 heads
    fc1 = get_leaf(params, "encoder.layers.0.fc1.w")
    assert fc1.shape[1] == arch.ffn_dim // 2

    # decode configs wired
    assert PRESETS["small_fp16_beam5_longform"].decode["beam_size"] == 5
    _, _, dcfg = PRESETS["medium_int4_kv8"].build(arch_override="test2l")
    assert dcfg.kv_int8


def test_cli_presets(capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["presets", "--arch-override", "test2l", "--samples", "2",
              "--batch-size", "2", "--max-new-tokens", "3",
              "--preset", "small_int8"])
    out = capsys.readouterr().out
    assert "small_int8" in out and "WER" in out


def test_cli_presets_longform(capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["presets", "--arch-override", "test2l", "--samples", "2",
              "--batch-size", "2", "--max-new-tokens", "3",
              "--preset", "small_fp16_beam5_longform"])
    out = capsys.readouterr().out
    assert "small_fp16_beam5_longform" in out
