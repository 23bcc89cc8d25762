"""QAT (quant/qat.py): STE gradient identity, fake-quant forward parity,
QAT beating PTQ at aggressive bit widths, pruning composition."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.audio import features
from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.distill import kl_loss
from openai_whisper_compression_tpu.evaluation.harness import samples_for_arch
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.models.whisper import (decode_logits,
                                                           encode)
from openai_whisper_compression_tpu.ops.qtensor import dequantize
from openai_whisper_compression_tpu.prune.magnitude import prune_global_l1
from openai_whisper_compression_tpu.quant.api import (dequantize_params,
                                                      quantize_params)
from openai_whisper_compression_tpu.quant.core import QUANTIZERS
from openai_whisper_compression_tpu.quant.qat import (make_ste_transform,
                                                      qat_distill,
                                                      quantized_leaf_names,
                                                      ste_fake_quant)


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    teacher = P.init_params(arch, jax.random.PRNGKey(0))
    return arch, teacher


def _fixed_batch(arch, batch=2, seq_len=6, seed=3):
    rng = np.random.default_rng(seed)
    n = samples_for_arch(arch)
    wav = jnp.asarray(rng.standard_normal((batch, n)) * 0.1, jnp.float32)
    mel = features.preprocess(wav, n_mels=arch.num_mel_bins, length=n)
    tokens = jnp.asarray(np.concatenate(
        [np.full((batch, 1), arch.decoder_start_token_id),
         rng.integers(0, arch.vocab_size, (batch, seq_len - 1))],
        axis=1), jnp.int32)
    return mel, tokens


def test_ste_gradient_is_identity():
    w = jnp.asarray(np.random.default_rng(0).standard_normal((16, 8)),
                    jnp.float32)
    g = jax.grad(lambda x: jnp.sum(ste_fake_quant(x, "int4") * 2.0))(w)
    np.testing.assert_allclose(np.asarray(g), 2.0, rtol=0, atol=0)


@pytest.mark.parametrize("method", ["int8", "int2", "nf4", "hqq_int4"])
def test_ste_forward_matches_ptq(method):
    w = jnp.asarray(np.random.default_rng(1).standard_normal((128, 16)),
                    jnp.float32)
    fq = ste_fake_quant(w, method)
    ref = dequantize(QUANTIZERS[method](w), jnp.float32)
    np.testing.assert_allclose(np.asarray(fq), np.asarray(ref),
                               rtol=0, atol=0)


def test_ste_transform_selects_linear_leaves(setup):
    arch, teacher = setup
    names = quantized_leaf_names(teacher)
    assert names and all(n.endswith(".w") for n in names)
    transform = make_ste_transform(teacher, "int8")
    out = transform(teacher)
    ref = dequantize_params(quantize_params(teacher, "int8"))
    for name in names:
        np.testing.assert_allclose(np.asarray(P.get_leaf(out, name)),
                                   np.asarray(P.get_leaf(ref, name)),
                                   rtol=0, atol=1e-6)
    # non-selected leaves untouched
    np.testing.assert_array_equal(
        np.asarray(P.get_leaf(out, "decoder.embed")),
        np.asarray(P.get_leaf(teacher, "decoder.embed")))


def test_qat_beats_ptq_at_int2(setup):
    """The headline property: at int2 (where PTQ collapses) QAT training on
    the deployment objective produces a strictly better quantized model."""
    arch, teacher = setup
    mel, tokens = _fixed_batch(arch)
    t_logits = decode_logits(teacher, arch, tokens, encode(teacher, arch, mel))

    def quantized_kl(params_q):
        dense = dequantize_params(params_q)
        return float(kl_loss(dense, t_logits, arch, mel, tokens,
                             temperature=1.0))

    ptq = quantize_params(teacher, "int2")
    batch_fn = lambda rng: (mel, tokens)  # noqa: E731 — fixed-batch QAT
    qat, history = qat_distill(teacher, teacher, arch, method="int2",
                               steps=25, lr=1e-3, batch_fn=batch_fn,
                               preserve_sparsity=False, temperature=1.0)
    assert history[-1] < history[0]          # optimizes its own objective
    assert quantized_kl(qat) < quantized_kl(ptq)  # and beats one-shot PTQ


def test_qat_preserves_pruned_support(setup):
    """prune -> QAT -> quantize keeps the sparse support: mask projection in
    distill plus symmetric quantizers mapping 0 -> 0."""
    arch, teacher = setup
    student = prune_global_l1(teacher, 0.5)
    qat, _ = qat_distill(student, teacher, arch, method="int4",
                         steps=4, lr=1e-3, batch=1, seq_len=4)
    dense = dequantize_params(qat)
    for (name, leaf) in P.named_leaves(student):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2 and name.endswith(".w"):
            rec = np.asarray(P.get_leaf(dense, name))
            assert np.all(rec[np.asarray(leaf) == 0] == 0)


def test_qat_rejects_quantized_student(setup):
    arch, teacher = setup
    with pytest.raises(ValueError):
        qat_distill(quantize_params(teacher, "int8"), teacher, arch,
                    steps=1)


def test_mesh_distill_matches_single_device(setup):
    """distill(mesh=) over a dp×tp mesh: GSPMD-sharded QAT/recovery steps
    produce the same loss trajectory as the single-device step."""
    from openai_whisper_compression_tpu.parallel import mesh as mesh_lib
    from openai_whisper_compression_tpu.quant.qat import make_ste_transform

    arch, teacher = setup
    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual 8-device mesh")
    mesh = mesh_lib.make_mesh(dp=2, tp=4)
    transform = make_ste_transform(teacher, "int4")

    def run(mesh_arg):
        from openai_whisper_compression_tpu.distill import distill

        _, hist = distill(teacher, teacher, arch, steps=3, lr=1e-3,
                          batch=2, seq_len=4, seed=7,
                          param_transform=transform,
                          preserve_sparsity=False, mesh=mesh_arg)
        return hist

    ref = run(None)
    sharded = run(mesh)
    np.testing.assert_allclose(sharded, ref, rtol=2e-3, atol=1e-5)


def test_recovery_sweep_through_driver(tmp_path):
    """The recovery sweep (ptq vs recover vs qat) runs end-to-end through
    the sweep driver and reports fidelity-vs-baseline for every rung."""
    from openai_whisper_compression_tpu.config import (DecodeConfig,
                                                       EvalConfig)
    from openai_whisper_compression_tpu.evaluation.data import (
        prepare_datasets)
    from openai_whisper_compression_tpu.evaluation.tokenizer import (
        WordTokenizer)
    from openai_whisper_compression_tpu.sweep.configs import recovery_sweep
    from openai_whisper_compression_tpu.sweep.driver import run_sweep

    arch = ARCHS["test2l"]
    params = P.init_params(arch, jax.random.PRNGKey(0))
    datasets = prepare_datasets(num_cal=2, num_test=2, seed=0)
    tok = WordTokenizer(arch.vocab_size, special_start=997)
    configs = recovery_sweep(methods=("int2",), steps=2, lr=1e-3)
    assert [c["name"] for c in configs] == [
        "baseline_fp32", "ptq_int2", "recover_int2", "qat_int2"]
    results = run_sweep(
        params, arch, configs, datasets, tok,
        eval_cfg=EvalConfig(batch_size=2, warmup_batches=0),
        decode_cfg=DecodeConfig(max_new_tokens=4, language_token_id=None,
                                task_token_id=None, notimestamps=False),
        save_path=str(tmp_path))
    for name in ("ptq_int2", "recover_int2", "qat_int2"):
        assert "error" not in results[name], results[name]
        assert results[name]["splits"]["test_clean"]["wer"] is not None
        assert results[name]["model_size_mb"] < \
            results["baseline_fp32"]["model_size_mb"]


def test_cli_distill_qat(tmp_path, capsys):
    from openai_whisper_compression_tpu import cli
    from openai_whisper_compression_tpu.ops.qtensor import QTensor
    from openai_whisper_compression_tpu.storage.formats import load_npz

    out = tmp_path / "qat.npz"
    cli.main(["distill", "--model", "test2l", "--quant", "int4", "--qat",
              "--steps", "3", "--lr", "1e-3", "--distill-batch", "1",
              "--seq-len", "4", "--save-path", str(out)])
    text = capsys.readouterr().out
    assert "QAT" in text and "saved" in text
    params = load_npz(str(out))
    kinds = {l.kind for l in jax.tree.leaves(
        params, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(l, QTensor)}
    assert kinds == {"int4_pack"}


def test_resolve_method_accepts_registry_names():
    """QAT takes the same --quant namespaces as every other surface:
    REGISTRY config names resolve to their base quantizer eagerly (clear
    error, not a KeyError inside the first jitted step)."""
    from openai_whisper_compression_tpu.quant.qat import resolve_method

    assert resolve_method("int8", {}) == ("int8", {})
    assert resolve_method("quanto_int8", {}) == ("int8", {})
    m, kw = resolve_method("bnb_nf4_double_quant", {"block_size": 32})
    assert m == "nf4_dq" and kw["block_size"] == 32
    with pytest.raises(KeyError):
        resolve_method("baseline_fp32", {})  # dtype-only: no weight quant
    with pytest.raises(KeyError):
        resolve_method("nope", {})
    # end-to-end: fake-quant under a registry name == under the base name
    w = jnp.asarray(np.random.default_rng(5).standard_normal((16, 8)),
                    jnp.float32)
    np.testing.assert_array_equal(np.asarray(ste_fake_quant(w, "quanto_int8")),
                                  np.asarray(ste_fake_quant(w, "int8")))


def test_recovery_ladder_honours_quant_kwargs(setup):
    """The shared CLI ladder keeps act/include_embed/quantizer kwargs on
    the final requant (they were silently dropped before), and fails fast
    on qat-without-method / steps<1."""
    from openai_whisper_compression_tpu.cli import _run_recovery_ladder
    from openai_whisper_compression_tpu.ops.qtensor import QTensor

    arch, teacher = setup
    out, hist, label = _run_recovery_ladder(
        teacher, teacher, arch, qat=True, steps=2, lr=1e-3,
        quant={"name": "int8", "act": "dynamic_int8"},
        batch=1, seq_len=4, preserve_sparsity=False)
    assert label == "QAT" and len(hist) == 2
    leaves = [l for l in jax.tree.leaves(
        out, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(l, QTensor)]
    assert leaves and all(l.act == "dynamic_int8" for l in leaves)

    with pytest.raises(SystemExit):
        _run_recovery_ladder(teacher, teacher, arch, qat=True, steps=1,
                             lr=1e-3, quant=None)
    with pytest.raises(SystemExit):
        _run_recovery_ladder(teacher, teacher, arch, qat=False, steps=0,
                             lr=1e-3, quant=None)
    with pytest.raises(SystemExit):
        _run_recovery_ladder(teacher, teacher, arch, qat=False, steps=1,
                             lr=1e-3, quant={"mixed_config": "x.json"})


def test_cli_distill_quant_recovery_not_noop(capsys):
    """--quant without --qat must run the PTQ->recover->requant ladder:
    the distilled loss starts from the PTQ gap (> 0), not from the
    dense-teacher self-distillation (~0)."""
    from openai_whisper_compression_tpu import cli

    cli.main(["distill", "--model", "test2l", "--quant", "int2",
              "--steps", "3", "--lr", "1e-3", "--distill-batch", "1",
              "--seq-len", "4"])
    text = capsys.readouterr().out
    first_loss = float(text.split("distill loss ")[1].split(" ->")[0])
    assert first_loss > 1e-3, text  # int2 rounding gap, not a no-op


def test_cli_distill_recovery_with_prune(capsys):
    from openai_whisper_compression_tpu import cli

    cli.main(["distill", "--model", "test2l", "--prune", "0.5",
              "--steps", "3", "--lr", "1e-3", "--distill-batch", "1",
              "--seq-len", "4"])
    text = capsys.readouterr().out
    assert "recovery" in text and "sparsity preserved: 0.3" in text
