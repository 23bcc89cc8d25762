"""Recovery distillation (distill.py): loss decreases, sparsity preserved,
teacher-student KL improves for a pruned student."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from openai_whisper_compression_tpu.config import ARCHS
from openai_whisper_compression_tpu.distill import (distill, sparsity_masks)
from openai_whisper_compression_tpu.models import params as P
from openai_whisper_compression_tpu.prune.magnitude import (prune_global_l1,
                                                            sparsity_report)
from openai_whisper_compression_tpu.quant.api import quantize_params


@pytest.fixture(scope="module")
def setup():
    arch = ARCHS["test2l"]
    teacher = P.init_params(arch, jax.random.PRNGKey(0))
    return arch, teacher


def test_distill_recovers_pruned_student(setup):
    arch, teacher = setup
    student = prune_global_l1(teacher, 0.6)
    s0 = sparsity_report(student)["overall_sparsity"]

    recovered, history = distill(student, teacher, arch, steps=12, lr=1e-3,
                                 batch=2, seq_len=6, seed=1)
    assert len(history) == 12
    # optimizing the objective: last quarter clearly below the first loss
    assert min(history[-3:]) < history[0]
    # pruned support preserved exactly on every >=2-D weight (other leaves —
    # biases, layernorms, incidental sinusoidal-position zeros — may move)
    del s0
    for leaf, rec in zip(jax.tree.leaves(student),
                         jax.tree.leaves(recovered)):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            np.testing.assert_array_equal(np.asarray(leaf) == 0,
                                          np.asarray(rec) == 0)


def test_masks_and_projection(setup):
    arch, teacher = setup
    student = prune_global_l1(teacher, 0.5)
    masks = sparsity_masks(student)
    flat = [m for m in jax.tree.leaves(masks) if m is not None]
    assert flat and all(m.dtype == bool for m in flat)

    recovered, _ = distill(student, teacher, arch, steps=2, lr=1e-3,
                           batch=1, seq_len=4)
    for leaf, rec in zip(jax.tree.leaves(student), jax.tree.leaves(recovered)):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            np.testing.assert_array_equal(np.asarray(leaf) == 0,
                                          np.asarray(rec) == 0)


def test_distill_rejects_quantized_student(setup):
    arch, teacher = setup
    with pytest.raises(ValueError):
        distill(quantize_params(teacher, "int8"), teacher, arch, steps=1)


def test_recovery_ladder_does_not_freeze_quant_zeros(setup, monkeypatch):
    """ADVICE r2 (medium): the non-QAT quant recovery rung must NOT freeze
    weights that PTQ rounded to zero — only genuinely pruned zeros. The
    ladder must call distill with preserve_sparsity=False for an unpruned
    student, and with masks from the PRE-quantization student when pruned
    (fake_quant_recovery semantics)."""
    import openai_whisper_compression_tpu.distill as distill_mod
    from openai_whisper_compression_tpu.cli import _run_recovery_ladder
    from openai_whisper_compression_tpu.quant.api import dequantize_params

    arch, teacher = setup
    quant = {"name": "int2"}
    seen = {}

    real_distill = distill_mod.distill

    def spy(student, *a, **kw):
        seen["preserve_sparsity"] = kw.get("preserve_sparsity", True)
        seen["sparsity_ref"] = kw.get("sparsity_ref")
        return real_distill(student, *a, **kw)

    monkeypatch.setattr(distill_mod, "distill", spy)

    # int2 really does round dense weights to zero — the hazard is real
    ptq_dense = dequantize_params(quantize_params(teacher, "int2"))
    zeros = sum(int((np.asarray(l) == 0).sum())
                for l in jax.tree.leaves(ptq_dense)
                if hasattr(l, "ndim") and l.ndim >= 2)
    assert zeros > 0

    # unpruned: quant-rounded zeros must be free to recover
    out, hist, label = _run_recovery_ladder(
        teacher, teacher, arch, qat=False, steps=2, lr=1e-3, quant=quant,
        pruned=False, batch=1, seq_len=4)
    assert label == "recovery" and len(hist) == 2
    assert seen["preserve_sparsity"] is False

    # pruned: masks frozen, and from the pre-quantization student
    student = prune_global_l1(teacher, 0.6)
    out_p, _, _ = _run_recovery_ladder(
        student, teacher, arch, qat=False, steps=2, lr=1e-3, quant=quant,
        pruned=True, batch=1, seq_len=4)
    assert seen["preserve_sparsity"] is True
    assert seen["sparsity_ref"] is student
    dense_p = dequantize_params(out_p)
    for leaf, rec in zip(jax.tree.leaves(student), jax.tree.leaves(dense_p)):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            # every pruned zero is still zero (quant may add more zeros)
            assert np.all(np.asarray(rec)[np.asarray(leaf) == 0] == 0)


def test_distill_sparsity_ref(setup):
    """sparsity_ref: masks come from the ref pytree, not the student."""
    arch, teacher = setup
    ref = prune_global_l1(teacher, 0.5)
    recovered, _ = distill(teacher, teacher, arch, steps=2, lr=1e-3,
                           batch=1, seq_len=4, sparsity_ref=ref)
    for leaf, rec in zip(jax.tree.leaves(ref), jax.tree.leaves(recovered)):
        if hasattr(leaf, "ndim") and leaf.ndim >= 2:
            assert np.all(np.asarray(rec)[np.asarray(leaf) == 0] == 0)


def test_fake_quant_recovery_runs(setup):
    from openai_whisper_compression_tpu.distill import fake_quant_recovery
    from openai_whisper_compression_tpu.ops.qtensor import QTensor

    arch, teacher = setup
    q = quantize_params(teacher, "int4")
    rec = fake_quant_recovery(q, teacher, arch, method="int4", steps=4,
                              lr=1e-4, batch=1, seq_len=4)
    kinds = {l.kind for l in jax.tree.leaves(
        rec, is_leaf=lambda x: isinstance(x, QTensor))
        if isinstance(l, QTensor)}
    assert kinds == {"int4_pack"}
