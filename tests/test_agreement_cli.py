"""Agreement harness + transcribe/agreement CLI tests."""

import json
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_agreement_orders_quant_methods():
    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.evaluation.agreement import model_agreement
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.quant import api as quant_api

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    g = np.random.default_rng(0)
    mels = jnp.asarray(g.standard_normal((2, arch.num_mel_bins, 64)),
                       jnp.float32)

    r8 = model_agreement(params, quant_api.quantize_params(params, "int8"),
                         arch, mels)
    r2 = model_agreement(params, quant_api.quantize_params(params, "int2"),
                         arch, mels)
    assert r8["token_agreement"] >= 0.95
    assert r8["mean_kl"] < 0.05
    # int2 is destructive -> strictly worse fidelity than int8
    assert r2["mean_kl"] > r8["mean_kl"]
    assert r2["logit_rel_err"] > r8["logit_rel_err"]
    # identity agreement is perfect
    rid = model_agreement(params, params, arch, mels)
    assert rid["token_agreement"] == 1.0 and rid["mean_kl"] < 1e-6


def test_cli_agreement(capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["agreement", "--model", "test2l", "--quant", "quanto_int8",
              "--samples", "2"])
    out = json.loads(capsys.readouterr().out)
    assert out["token_agreement"] > 0.9


def test_cli_transcribe_wav(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    # 8 kHz stereo PCM wav -> exercises channel-mix + native resample
    sr = 8000
    t = np.arange(int(0.7 * sr)) / sr
    mono = (0.3 * np.sin(2 * np.pi * 300 * t) * 32767).astype(np.int16)
    stereo = np.stack([mono, mono], axis=1).reshape(-1)
    path = tmp_path / "a.wav"
    with wave.open(str(path), "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(stereo.tobytes())

    cli.main(["transcribe", "--model", "test2l", "--audio", str(path),
              "--max-new-tokens", "3", "--batch-size", "1"])
    out = capsys.readouterr().out
    assert isinstance(out, str)  # gibberish text from random weights is fine


def test_cli_transcribe_npy(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    wav = np.random.default_rng(0).standard_normal(8000).astype(np.float32)
    path = tmp_path / "a.npy"
    np.save(path, wav)
    cli.main(["transcribe", "--model", "test2l", "--audio", str(path),
              "--max-new-tokens", "3", "--batch-size", "1"])
    assert capsys.readouterr().out is not None


def test_cli_run_config(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    cfg = {
        "model": "test2l", "dtype": "float32",
        "quantization": {"name": "quanto_int8"},
        "pruning": {"global_l1": 0.3},
        "decode": {"max_new_tokens": 4, "language_token_id": None,
                   "task_token_id": None, "notimestamps": False},
        "eval": {"num_samples": 4, "batch_size": 2, "warmup_batches": 0,
                 "save_path": str(tmp_path)},
    }
    path = tmp_path / "run.json"
    path.write_text(json.dumps(cfg))
    scores = cli.main(["run", "--config", str(path)])
    assert scores["num_samples"] == 4
    assert (tmp_path / "test2l_results.json").exists()


def test_cli_transcribe_temperature_fallback(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli

    path = tmp_path / "b.npy"
    np.save(path, (np.random.default_rng(0).standard_normal(8000) * 0.05
                   ).astype(np.float32))
    cli.main(["transcribe", "--model", "test2l", "--audio", str(path),
              "--max-new-tokens", "3", "--batch-size", "1",
              "--temperatures", "0,0.5"])
    assert isinstance(capsys.readouterr().out, str)


def test_cli_run_data_aware_and_mixed(tmp_path):
    """RunConfig quantization supports DATA_AWARE names (calibrated on the
    loaded split) and mixed_config artifacts."""
    import json

    import jax

    from openai_whisper_compression_tpu import cli
    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.quant import mixed
    from openai_whisper_compression_tpu.sensitivity import gradient

    base = {
        "model": "test2l",
        "decode": {"max_new_tokens": 4, "language_token_id": None,
                   "task_token_id": None, "notimestamps": False},
        "eval": {"num_samples": 2, "batch_size": 2, "warmup_batches": 0},
    }
    cfg = dict(base, quantization={"name": "gptq_int4"})
    path = tmp_path / "da.json"
    path.write_text(json.dumps(cfg))
    scores = cli.main(["run", "--config", str(path)])
    assert scores["num_samples"] == 2

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    batches = gradient.make_synthetic_batches(arch, n_batches=1, batch=2,
                                              seq=8)
    qcfg = mixed.generate_quant_config(
        params, gradient.compute_sensitivity(params, arch, batches), 6.0)
    qpath = mixed.save_quant_config(qcfg, str(tmp_path / "mixed.json"))
    cfg = dict(base, quantization={"mixed_config": qpath})
    path2 = tmp_path / "mx.json"
    path2.write_text(json.dumps(cfg))
    scores = cli.main(["run", "--config", str(path2)])
    assert scores["num_samples"] == 2


def test_cli_export_hf_state_dict(tmp_path, capsys):
    """export: HF-named npz/pt state dicts from fresh, quantized, and
    stored-compressed models; keys/values round-trip through the HF
    converter."""
    from openai_whisper_compression_tpu import cli
    from openai_whisper_compression_tpu.config import ARCHS
    from openai_whisper_compression_tpu.models import params as P
    from openai_whisper_compression_tpu.models.convert import (
        from_hf_state_dict)
    from openai_whisper_compression_tpu.storage.formats import save_sparse_zip

    out = tmp_path / "m.npz"
    cli.main(["export", "--model", "test2l", "--out", str(out)])
    assert "exported" in capsys.readouterr().out
    sd = dict(np.load(out))
    assert any(k.endswith("encoder.conv1.weight") for k in sd)
    # round-trip: converter rebuilds the same pytree values
    rebuilt = from_hf_state_dict(sd)
    params = P.init_params(ARCHS["test2l"], jax.random.PRNGKey(0))
    np.testing.assert_allclose(
        np.asarray(rebuilt["encoder"]["layers"][0]["fc1"]["w"]),
        np.asarray(params["encoder"]["layers"][0]["fc1"]["w"]), atol=1e-6)

    # quantized export: dequantized (fake-quant) values, still HF-shaped
    outq = tmp_path / "q.pt"
    cli.main(["export", "--model", "test2l", "--quant", "quanto_int8",
              "--out", str(outq)])
    import torch

    sdq = torch.load(outq, weights_only=True)
    w = sdq["model.encoder.layers.0.fc1.weight"]
    a = ARCHS["test2l"]
    assert tuple(w.shape) == (a.ffn_dim, a.d_model)  # HF (out, in) layout
    # int8 rounding baked in: close to, but not equal to, the fp weights
    dense_t = torch.from_numpy(np.asarray(
        params["encoder"]["layers"][0]["fc1"]["w"]).T)
    assert not torch.equal(w, dense_t)
    assert torch.allclose(w, dense_t, atol=0.05)

    # stored-compressed model -> export (loader sniffing)
    zpath = tmp_path / "c.zip"
    save_sparse_zip(params, str(zpath))
    out2 = tmp_path / "c.npz"
    cli.main(["export", "--model", "test2l", "--load", str(zpath),
              "--out", str(out2)])
    sd2 = dict(np.load(out2))
    assert set(sd2) == set(sd)

    # safetensors export: loads straight back via the universal loader
    from openai_whisper_compression_tpu.models.convert import (
        load_checkpoint, read_safetensors)

    outs = tmp_path / "m.safetensors"
    cli.main(["export", "--model", "test2l", "--out", str(outs)])
    sds = read_safetensors(str(outs))
    assert set(sds) == set(sd)
    loaded, _ = load_checkpoint(str(outs))
    np.testing.assert_array_equal(
        np.asarray(loaded["encoder"]["layers"][0]["fc1"]["w"]),
        np.asarray(params["encoder"]["layers"][0]["fc1"]["w"]))


def test_cli_run_with_recovery(tmp_path):
    """RunConfig.recovery: declarative QAT / recovery ladder in the
    experiment schema."""
    from openai_whisper_compression_tpu import cli

    base = {
        "model": "test2l",
        "decode": {"max_new_tokens": 4, "language_token_id": None,
                   "task_token_id": None, "notimestamps": False},
        "eval": {"num_samples": 2, "batch_size": 2, "warmup_batches": 0},
    }
    cfg = dict(base, quantization={"name": "quanto_int2"},
               recovery={"qat": True, "steps": 2, "lr": 1e-3})
    p = tmp_path / "qat.json"
    p.write_text(json.dumps(cfg))
    scores = cli.main(["run", "--config", str(p)])
    assert scores["num_samples"] == 2

    # prune-only recovery (no quantization)
    cfg2 = dict(base, pruning={"global_l1": 0.5},
                recovery={"steps": 2, "lr": 1e-3})
    p2 = tmp_path / "rec.json"
    p2.write_text(json.dumps(cfg2))
    scores = cli.main(["run", "--config", str(p2)])
    assert scores["num_samples"] == 2

    # recovery with a non-weight-quant method must fail fast
    cfg3 = dict(base, quantization={"name": "gptq_int4"},
                recovery={"qat": True, "steps": 1})
    p3 = tmp_path / "bad.json"
    p3.write_text(json.dumps(cfg3))
    with pytest.raises((KeyError, SystemExit)):
        cli.main(["run", "--config", str(p3)])
