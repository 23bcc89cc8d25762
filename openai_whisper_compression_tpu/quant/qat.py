"""Quantization-aware training via straight-through estimators.

The reference is post-training only: quantize once, measure WER, done
(`model_utils.py:76-149`, `quantization.py:42-90`). `distill.py` already
goes one step beyond with `fake_quant_recovery` (dequantize -> fine-tune
-> requantize), but that only repairs the *current* rounding error — the
recovered weights are re-quantized blind at the end, reintroducing error.

True QAT closes the loop: every training forward runs on FAKE-QUANTIZED
weights (`w + stop_gradient(fq(w) - w)`), so the loss the optimizer sees
IS the loss the deployed quantized model will have, while gradients pass
straight through to the latent dense weights. The latent weights learn to
sit where the quantizer grid can represent them. At int2/int3 — where PTQ
collapses — this is the difference between unusable and usable.

TPU-native shape: the transform is a pure `params -> params'` function
applied inside the jitted distillation step (one compiled program for
teacher forward, fake-quant, student forward+grad, AdamW update), reusing
the same `QUANTIZERS` the deployment path uses, so the final
`quantize_params(latent)` model computes exactly the weights the last
training step optimized (identical quantizer on identical latent values;
deployed Pallas kernels differ only in accumulation rounding).

Composes with pruning: `distill`'s mask projection keeps the pruned
support, and the symmetric int quantizers map 0 -> 0, so sparse+QAT
yields a model that is both sparse and quantization-shaped.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..models.params import get_leaf, named_leaves, set_leaf
from ..ops.qtensor import QTensor, dequantize
from .api import EMBED_RE, LINEAR_WEIGHT_RE, _copy_tree, quantize_params
from .core import QUANTIZERS

Params = dict[str, Any]


def resolve_method(method: str, kw: dict[str, Any]
                   ) -> tuple[str, dict[str, Any]]:
    """method -> (QUANTIZERS name, merged kwargs). Accepts raw QUANTIZERS
    names and REGISTRY config names (e.g. "quanto_int8" -> "int8"), the
    same namespaces every other --quant surface takes — resolved and
    validated EAGERLY so an unknown name fails with a clear message
    instead of a KeyError inside the first jitted training step. QAT is
    weight-only: a REGISTRY config's dtype/act fields are ignored (the
    STE models the weight rounding; activation quant stays a deploy-time
    choice)."""
    if method in QUANTIZERS:
        return method, dict(kw)
    from .api import REGISTRY

    cfg = REGISTRY.get(method)
    if cfg is not None and cfg.method in QUANTIZERS:
        return cfg.method, {**dict(cfg.kwargs), **kw}
    raise KeyError(
        f"unknown or non-weight-quant method {method!r} for QAT; "
        f"quantizers: {sorted(QUANTIZERS)}; resolvable configs: "
        f"{sorted(n for n, c in REGISTRY.items() if c.method in QUANTIZERS)}")


def ste_fake_quant(w: jax.Array, method: str = "int8", **kw: Any) -> jax.Array:
    """Quantize-dequantize `w` with QUANTIZERS[method]; identity gradient.

    Forward value = dequantize(quantize(w)) (the deployed weight);
    backward = straight-through (d/dw = 1), the classic STE
    (Bengio et al. 2013, arXiv:1308.3432). Written as
    `stop_gradient(fq) + (w - stop_gradient(w))` — not the usual
    `w + stop_gradient(fq - w)`, whose forward differs from fq by one
    float rounding — so the training forward is BIT-IDENTICAL to the
    deployed dequantized weight. No custom_vjp needed.
    """
    method, kw = resolve_method(method, kw)
    fq = dequantize(QUANTIZERS[method](w, **kw), jnp.float32).astype(w.dtype)
    return jax.lax.stop_gradient(fq) + (w - jax.lax.stop_gradient(w))


def quantized_leaf_names(params: Params, include_embed: bool = False,
                         name_filter: Callable[[str], bool] | None = None
                         ) -> list[str]:
    """The dotted leaf names `quantize_params` would quantize — computed
    once (static) so the per-step transform does no Python re-matching."""
    names = []
    for name, leaf in named_leaves(params):
        if isinstance(leaf, QTensor):
            continue
        if not (LINEAR_WEIGHT_RE.search(name)
                or (include_embed and EMBED_RE.match(name))):
            continue
        if name_filter is not None and not name_filter(name):
            continue
        names.append(name)
    return names


def make_ste_transform(params: Params, method: str = "int8",
                       include_embed: bool = False,
                       name_filter: Callable[[str], bool] | None = None,
                       **kw: Any) -> Callable[[Params], Params]:
    """Build the pure fake-quant transform for `distill(param_transform=)`.

    Selection is fixed at build time from `params`' structure (same rules as
    `quantize_params`); the returned fn is jit-safe and differentiable.
    """
    method, kw = resolve_method(method, kw)   # fail fast, outside the jit
    names = quantized_leaf_names(params, include_embed, name_filter)

    def transform(p: Params) -> Params:
        out = _copy_tree(p)
        for name in names:
            set_leaf(out, name, ste_fake_quant(get_leaf(p, name),
                                               method, **kw))
        return out

    return transform


def qat_distill(student: Params, teacher: Params, arch: Any,
                method: str = "int4", steps: int = 60, lr: float = 3e-5,
                include_embed: bool = False,
                name_filter: Callable[[str], bool] | None = None,
                quant_kwargs: dict[str, Any] | None = None,
                **distill_kw: Any) -> tuple[Params, list[float]]:
    """QAT: KL-distill `student` toward `teacher` with every forward on
    STE-fake-quantized weights, then quantize the latent weights with the
    SAME quantizer. Returns (quantized params, per-step loss history).

    `student` must be dense (start from the teacher itself, or a pruned
    copy — sparsity is preserved via distill's mask projection).
    `method` is a QUANTIZERS entry or a weight-quant REGISTRY config name
    (resolved by `resolve_method`; dtype/act fields are ignored — QAT is
    weight-only).
    """
    from ..distill import distill

    method, qkw = resolve_method(method, dict(quant_kwargs or {}))
    transform = make_ste_transform(student, method, include_embed,
                                   name_filter, **qkw)
    latent, history = distill(student, teacher, arch, steps=steps, lr=lr,
                              param_transform=transform, **distill_kw)
    out = quantize_params(latent, method, include_embed=include_embed,
                          name_filter=name_filter, **qkw)
    return out, history


# QAT-supported methods: anything whose quantizer is pure jittable math.
# (All QUANTIZERS entries qualify; listed for CLI/help discoverability.)
QAT_METHODS = tuple(sorted(QUANTIZERS))
