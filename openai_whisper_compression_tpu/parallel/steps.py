"""Sharded execution steps: dp/tp training step and dp evaluation step.

The training step exists for the gradient-based sensitivity scorers
(reference computes grads only to score parameter importance,
`gradient_sensitivity_test.py:229-262`) and as the scale-up path for any
future fine-tuning; under GSPMD the same code runs 1..N chips.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh

from ..config import WhisperArch
from ..models.whisper import nll_loss
from . import mesh as mesh_lib


def make_train_step(arch: WhisperArch, mesh: Mesh, lr: float = 1e-4):
    """SGD training step jitted over the mesh: batch sharded on 'dp',
    params sharded per param_specs ('tp' on heads/FFN). Returns
    (step_fn, place_params, place_batch)."""

    def step(params, mel, tokens, labels):
        loss, grads = jax.value_and_grad(nll_loss)(params, arch, mel,
                                                   tokens, labels)
        params = jax.tree.map(lambda p, g: p - lr * g.astype(p.dtype),
                              params, grads)
        return params, loss

    def place_params(params):
        return mesh_lib.shard_params(params, mesh)

    def place_batch(*arrays):
        sh = mesh_lib.batch_sharding(mesh)
        return tuple(jax.device_put(a, sh) for a in arrays)

    return jax.jit(step, donate_argnums=(0,)), place_params, place_batch


def make_eval_step(arch: WhisperArch, mesh: Mesh, decode_cfg=None):
    """Data-parallel transcription step: waveform batch sharded over 'dp'.

    This is the throughput scale-out for the eval harness (the per-chip path
    stays identical; GSPMD splits the batch). NOTE: on a >1-device mesh the
    fused Pallas decode cross-attention is disabled (GSPMD cannot
    auto-partition a pallas_call; the explicit shard_map serving path in
    tp_forward is the kernel-compatible multi-chip route)."""
    import dataclasses

    from ..evaluation.harness import make_transcribe_fn

    if decode_cfg is not None and mesh.size > 1 and decode_cfg.cross_pallas:
        decode_cfg = dataclasses.replace(decode_cfg, cross_pallas=False)
    fn = make_transcribe_fn(arch, decode_cfg) if decode_cfg else None

    def place_batch(wav):
        return jax.device_put(wav, mesh_lib.batch_sharding(mesh))

    return fn, place_batch
