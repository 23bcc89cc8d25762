"""Recovery distillation: fine-tune a compressed student against its own
uncompressed teacher.

The reference evaluates compression one-shot — prune/quantize, measure WER,
done (e.g. `unstructured_L1_baseline.py:1128-1310`); there is no recovery
step anywhere in the repo. On TPU the missing piece is cheap: the framework
already differentiates the full model for sensitivity scoring
(`sensitivity/gradient.py` via `jax.grad`), so a KL-distillation loop over
synthetic audio needs no labeled data at all — the teacher IS the label.

Pipeline: prune (keeping masks) -> `distill(student, teacher, ...)` ->
re-evaluate agreement. Sparsity is preserved exactly: gradients and updates
are projected onto the pruned support (classic lottery-ticket-style masked
fine-tuning), so the recovered model keeps its compression ratio.

Everything runs in one jitted step (teacher forward, student forward+grad,
AdamW update, mask projection); batches are synthetic 30 s waveforms pushed
through the real mel frontend.
"""

from __future__ import annotations


from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from .audio import features
from .config import WhisperArch
from .evaluation.harness import samples_for_arch
from .models.whisper import decode_logits, encode
from .ops.qtensor import QTensor

Params = dict[str, Any]


def sparsity_masks(params: Params) -> Any:
    """Zero-pattern masks for every >=2-D dense weight (None elsewhere):
    the pruned support that distillation must preserve."""
    def mask(x):
        if isinstance(x, QTensor) or not hasattr(x, "ndim") or x.ndim < 2:
            return None
        return (x != 0)

    return jax.tree.map(mask, params)


def _apply_masks(tree: Any, masks: Any) -> Any:
    return jax.tree.map(
        lambda x, m: x if m is None else jnp.where(m, x, 0).astype(x.dtype),
        tree, masks, is_leaf=lambda x: x is None)


def kl_loss(student: Params, teacher_logits: jax.Array, arch: WhisperArch,
            mel: jax.Array, tokens: jax.Array,
            temperature: float = 2.0) -> jax.Array:
    """Mean KL(teacher || student) over all positions at `temperature`."""
    s_logits = decode_logits(student, arch, tokens,
                             encode(student, arch, mel)).astype(jnp.float32)
    t = temperature
    p = jax.nn.log_softmax(teacher_logits.astype(jnp.float32) / t, axis=-1)
    q = jax.nn.log_softmax(s_logits / t, axis=-1)
    return jnp.mean(jnp.sum(jnp.exp(p) * (p - q), axis=-1)) * (t * t)


def distill(student: Params, teacher: Params, arch: WhisperArch,
            steps: int = 50, lr: float = 3e-5, batch: int = 2,
            seq_len: int = 8, temperature: float = 2.0, seed: int = 0,
            preserve_sparsity: bool = True,
            sparsity_ref: Params | None = None,
            batch_fn: Callable[[np.random.Generator], tuple] | None = None,
            param_transform: Callable[[Params], Params] | None = None,
            mesh=None, compute_dtype=None) -> tuple[Params, list[float]]:
    """KL-distill `student` toward `teacher` (same arch) on synthetic audio.

    batch_fn: optional (rng) -> (mel (B, M, F), tokens (B, L)) supplier to
    distill on real data instead of noise; may return a third element —
    precomputed teacher logits (B, L, V) — to skip the per-step teacher
    forward entirely (right when the pool is small and fixed, e.g. the
    curve's recovery rungs).

    sparsity_ref: when preserve_sparsity is on, compute the frozen-zero
    masks from THIS pytree instead of `student`. Pass the pre-quantization
    pruned model when distilling a dequantized PTQ student, so only the
    *pruned* zeros are frozen — not every weight the quantizer happened to
    round to zero (a large fraction at int2/int3).

    mesh: optional `jax.sharding.Mesh` (('dp','tp') axes from
    `parallel.mesh.make_mesh`): params/optimizer state are placed per
    `parallel.mesh.param_specs` and each batch is split over 'dp' —
    GSPMD inserts the gradient psums, so recovery/QAT fine-tuning scales
    to a slice with zero changes to the step. `batch` must divide by the
    dp axis.

    param_transform: optional pure fn applied to the student INSIDE the loss
    (the forward runs on `param_transform(student)`, gradients flow back
    through it to the latent `student`). This is the QAT hook: pass an STE
    fake-quant transform (`quant.qat.make_ste_transform`) so the optimizer
    sees quantization error every step.

    compute_dtype: optional dtype (e.g. jnp.float32) the OPTIMIZATION runs
    in — float student leaves are cast up at entry and back to their
    original dtype at exit. Use when distilling a bf16 model: adamw
    updates at lr ~1e-4 sit below bf16 resolution, and f32 keeps the
    step program small (the teacher forward stays hoisted either way).

    Returns (recovered student, per-step loss history). Quantized leaves
    (QTensor) are frozen — dequantize first for fake-quant fine-tuning.
    """
    if any(isinstance(l, QTensor) for l in jax.tree.leaves(
            student, is_leaf=lambda x: isinstance(x, QTensor))):
        raise ValueError("student has quantized leaves; distill the dense "
                         "(or dequantized fake-quant) model, then requantize")
    n_samples = samples_for_arch(arch)
    orig_dtypes = None
    if compute_dtype is not None:
        orig_dtypes = jax.tree.map(lambda a: jnp.asarray(a).dtype, student)
        student = jax.tree.map(
            lambda a: a.astype(compute_dtype) if jnp.issubdtype(
                jnp.asarray(a).dtype, jnp.floating) else a, student)
    masks = (sparsity_masks(student if sparsity_ref is None else sparsity_ref)
             if preserve_sparsity else None)
    batch_sharding = None
    if mesh is not None:
        from .parallel import mesh as mesh_lib

        student = mesh_lib.shard_params(student, mesh)
        teacher = mesh_lib.shard_params(teacher, mesh)
        batch_sharding = mesh_lib.batch_sharding(mesh)
    opt = optax.adamw(lr)
    opt_state = opt.init(student)

    # The teacher is FROZEN, so its logits are data, not graph: computing
    # them in a separate jit keeps the step graph to student fwd+bwd+adamw
    # only. Fusing the teacher forward into the step's graph ballooned the
    # whisper-small f32 compile past 24 min on this host; split, the step
    # compiles in ~30 s and the teacher forward (compiled once) amortizes
    # across every step that reuses a (mel, tokens) pair.
    # teacher params as an ARGUMENT, never a closure: closed-over pytrees
    # bake into the program as constants, inflating the remote-compile
    # request by the full model size (measured: HTTP 413 / broken-pipe
    # tunnel failures at whisper-small scale)
    @jax.jit
    def teacher_fwd(tp, mel, tokens):
        return decode_logits(tp, arch, tokens, encode(tp, arch, mel))

    @jax.jit
    def step(student, opt_state, mel, tokens, t_logits):
        t_logits = jax.lax.stop_gradient(t_logits)

        def loss_fn(s):
            if param_transform is not None:
                s = param_transform(s)
            return kl_loss(s, t_logits, arch, mel, tokens, temperature)

        loss, grads = jax.value_and_grad(loss_fn)(student)
        if masks is not None:
            grads = _apply_masks(grads, masks)
        updates, opt_state = opt.update(grads, opt_state, student)
        student = optax.apply_updates(student, updates)
        if masks is not None:
            student = _apply_masks(student, masks)
        return student, opt_state, loss

    rng = np.random.default_rng(seed)
    history: list[float] = []
    for _ in range(steps):
        t_logits = None
        if batch_fn is not None:
            # batch_fn returns (mel, tokens) or (mel, tokens,
            # teacher_logits) — star-unpack so any iterable works and a
            # wrong arity raises a clear ValueError, not len()'s TypeError
            # on generators (ADVICE r4 #3)
            mel, tokens, *rest = batch_fn(rng)
            if rest:              # caller precomputed the frozen pool
                t_logits = jnp.asarray(rest[0])
            mel = jnp.asarray(mel)
            tokens = jnp.asarray(tokens, jnp.int32)
        else:
            wav = jnp.asarray(
                rng.standard_normal((batch, n_samples)) * 0.1, jnp.float32)
            mel = features.preprocess(wav, n_mels=arch.num_mel_bins,
                                      length=n_samples)
            tokens = jnp.asarray(
                np.concatenate(
                    [np.full((batch, 1), arch.decoder_start_token_id),
                     rng.integers(0, arch.vocab_size,
                                  (batch, seq_len - 1))], axis=1), jnp.int32)
        if batch_sharding is not None:
            mel = jax.device_put(mel, batch_sharding)
            tokens = jax.device_put(tokens, batch_sharding)
            if t_logits is not None:
                # precomputed teacher logits must land on the same dp
                # sharding as mel/tokens, or GSPMD replicates/reshards the
                # (B, L, V) array every step (ADVICE r4 #1)
                t_logits = jax.device_put(t_logits, batch_sharding)
        if t_logits is None:
            t_logits = teacher_fwd(teacher, mel, tokens)
        student, opt_state, loss = step(student, opt_state, mel, tokens,
                                        t_logits)
        history.append(float(loss))
    if orig_dtypes is not None:
        student = jax.tree.map(
            lambda a, d: a.astype(d) if jnp.issubdtype(d, jnp.floating)
            else a, student, orig_dtypes)
    return student, history


def fake_quant_recovery(params_q: Params, teacher: Params,
                        arch: WhisperArch, method: str = "int4",
                        steps: int = 50, lr: float = 3e-5,
                        **distill_kw) -> Params:
    """QAT-lite: dequantize a quantized model (quantization error baked into
    dense weights), KL-distill it toward the dense teacher, then requantize
    with the same method. One round of this recovers part of the rounding
    loss without straight-through estimators (quantize -> recover -> requant,
    a post-training analog of quantization-aware training). For true QAT —
    fake-quant forwards with STE gradients every step — use
    `quant.qat.qat_distill`, which strictly dominates this at low bit widths.

    Returns the re-quantized recovered model.
    """
    from .quant.api import dequantize_params, quantize_params

    dense = dequantize_params(params_q)
    recovered, _ = distill(dense, teacher, arch, steps=steps, lr=lr,
                           preserve_sparsity=False, **distill_kw)
    return quantize_params(recovered, method=method)
