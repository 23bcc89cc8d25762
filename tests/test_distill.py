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
