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


def make_dp_transcribe(arch: WhisperArch, mesh: Mesh, decode_cfg=None,
                       axis: str = "dp", **fn_kwargs):
    """Kernel-preserving data-parallel transcription (VERDICT r2 #3).

    The single-device flagship program — fused Pallas decode
    cross-attention, fused self-attention step, quantized matmul kernels,
    the full greedy/beam/timestamp machinery of `make_transcribe_fn` —
    runs UNCHANGED inside `shard_map`: every device sees its local batch
    shard as a plain array, params are replicated, and there is zero
    cross-device communication (batch rows are independent). GSPMD cannot
    auto-partition a `pallas_call`, which is why the old pjit route had to
    turn `cross_pallas` off on >1 device and regress per-chip decode
    throughput (DESIGN.md §8: the fused kernel is the 14→3.9 ms/step win);
    shard_map sidesteps GSPMD entirely.

    On a ('dp','tp') mesh the batch splits over 'dp' and the program is
    replicated over 'tp' (use `tp_forward.make_tp_decoder` to shard the
    model itself). Batch size must divide by the 'dp' axis size.

    Returns (jitted (params, wav) -> (tokens, lengths), place_batch)."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    from ..evaluation.harness import make_transcribe_fn

    fn = make_transcribe_fn(arch, decode_cfg, **fn_kwargs)
    dp = mesh.shape[axis]

    run = shard_map(
        lambda params, wav: fn(params, wav),
        mesh=mesh,
        in_specs=(P(), P(axis)),        # params replicated, batch on dp
        out_specs=(P(axis), P(axis)),
        check_vma=False,                # no collectives: nothing to check
    )

    @jax.jit
    def step(params, wav):
        return run(params, wav)

    def place_batch(wav):
        if wav.shape[0] % dp:
            raise ValueError(
                f"batch {wav.shape[0]} not divisible by dp={dp}")
        return jax.device_put(wav, mesh_lib.batch_sharding(mesh))

    return step, place_batch


def make_eval_step(arch: WhisperArch, mesh: Mesh, decode_cfg=None):
    """Data-parallel transcription step: waveform batch sharded over 'dp'.

    Multi-device meshes route through `make_dp_transcribe` (shard_map), so
    the fused Pallas decode kernels survive scale-out — per-chip throughput
    is the single-chip program's. Single-device meshes keep the plain jitted
    fn (no shard_map wrapping to stay off the virtual-mesh code path)."""
    from ..evaluation.harness import make_transcribe_fn

    if decode_cfg is None:
        def place_batch(wav):
            return jax.device_put(wav, mesh_lib.batch_sharding(mesh))

        return None, place_batch
    if mesh.size > 1:
        return make_dp_transcribe(arch, mesh, decode_cfg)
    fn = make_transcribe_fn(arch, decode_cfg)

    def place_batch(wav):
        return jax.device_put(wav, mesh_lib.batch_sharding(mesh))

    return fn, place_batch
