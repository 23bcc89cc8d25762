"""Quantization API: pure `params -> params'` transforms + named registry.

Replaces the reference's quantized-model factory `load_whisper_model`
(`model_utils.py:76-149`) and its config matrices (`quantization.py:42-90`,
`pruning+quantization/pruning_quantization_all.py:1392-1460`): instead of
swapping nn.Module classes, each linear weight leaf becomes a `QTensor` and
the model code runs unchanged.
"""

from __future__ import annotations

import dataclasses
import re
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..models.params import named_leaves, set_leaf, tree_cast
from ..ops.qtensor import QTensor
from .core import QUANTIZERS

# Linear weight leaves: attention projections + FFN. Conv stem, layernorms,
# biases, positions stay dense (the reference backends also only touch
# nn.Linear, e.g. `dynamic_evaluation_pytorch.py:154-158`).
LINEAR_WEIGHT_RE = re.compile(
    r"\.(attn|cross)\.(q|k|v|o)\.w$|\.fc[12]\.w$")
EMBED_RE = re.compile(r"^decoder\.embed$")


def _copy_tree(params: Any) -> Any:
    """Shallow-structure deep copy so set_leaf doesn't mutate the input."""
    if isinstance(params, dict):
        return {k: _copy_tree(v) for k, v in params.items()}
    if isinstance(params, list):
        return [_copy_tree(v) for v in params]
    return params


def quantize_params(params: Any, method: str = "int8",
                    act: str | None = None,
                    include_embed: bool = False,
                    name_filter: Callable[[str], bool] | None = None,
                    **kw: Any) -> Any:
    """Quantize every linear weight with QUANTIZERS[method].

    act: None | "dynamic_int8" | "static_int8" (weight+activation modes).
    name_filter: optional predicate on dotted leaf names to restrict scope.

    `method` may also be a REGISTRY config name (e.g. "quanto_int8", the
    names the CLI's --quant flag takes): the named config is applied
    (dtype cast + weight quant + act mode), with `act`/`name_filter`/`kw`
    still honoured on the weight-quant step.
    """
    if method not in QUANTIZERS and method in REGISTRY:
        cfg = REGISTRY[method]
        p = params
        if cfg.dtype:
            p = tree_cast(p, jnp.dtype(cfg.dtype))
        if not cfg.method:
            return p
        return quantize_params(p, cfg.method,
                               act=act if act is not None else cfg.act,
                               include_embed=include_embed,
                               name_filter=name_filter,
                               **{**dict(cfg.kwargs), **kw})
    try:
        quantizer = QUANTIZERS[method]
    except KeyError:
        raise KeyError(
            f"unknown quant method {method!r}; quantizers: "
            f"{sorted(QUANTIZERS)}; named configs: {sorted(REGISTRY)}"
        ) from None
    out = _copy_tree(params)
    for name, leaf in named_leaves(params):
        if isinstance(leaf, QTensor):
            continue
        is_linear = bool(LINEAR_WEIGHT_RE.search(name))
        is_embed = bool(include_embed and EMBED_RE.match(name))
        if not (is_linear or is_embed):
            continue
        if name_filter is not None and not name_filter(name):
            continue
        # embed is quantized in its natural (V, d) orientation; the lookup /
        # tied proj_out paths dequantize it (models.whisper.embed_tokens).
        q = quantizer(leaf, **kw)
        if act is not None and is_linear:
            q = dataclasses.replace(q, act=act)
        set_leaf(out, name, q)
    return out


def dequantize_params(params: Any, dtype=jnp.float32) -> Any:
    """Materialize every QTensor back to a dense array ("fake-quant" params:
    quantization error baked in, plain dtype storage). Used for HF export
    and for isolating quantization's numeric effect from its kernels."""
    from ..ops.qtensor import dequantize

    return jax.tree.map(
        lambda x: dequantize(x, dtype) if isinstance(x, QTensor) else x,
        params, is_leaf=lambda x: isinstance(x, QTensor))


def calibrate_static(params: Any, run_fn: Callable[[Any], None]) -> Any:
    """Static-quant calibration: `run_fn(params)` should execute
    representative batches (eager). Returns frozen params
    (≈ reference `apply_static_quantization`, `model_utils.py:152-214`)."""
    from . import calibrate

    with calibrate.calibration() as store:
        run_fn(params)
    return calibrate.freeze(params, store)


# ---------------------------------------------------------------------------
# Named configuration registry (parity with the reference's sweep matrices)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class QuantConfig:
    name: str
    method: str | None          # None = no weight quant (dtype-only)
    act: str | None = None
    dtype: str | None = None    # cast model to this dtype first
    needs_calibration: bool = False
    kwargs: tuple = ()

    def apply(self, params: Any) -> Any:
        p = params
        if self.dtype:
            p = tree_cast(p, jnp.dtype(self.dtype))
        if self.method:
            p = quantize_params(p, self.method, act=self.act,
                                **dict(self.kwargs))
        return p


REGISTRY: dict[str, QuantConfig] = {c.name: c for c in [
    # reference `quantization.py:42-90` matrix
    QuantConfig("baseline_fp32", None, dtype="float32"),
    QuantConfig("baseline_bf16", None, dtype="bfloat16"),
    QuantConfig("fp16", None, dtype="float16"),
    QuantConfig("pytorch_dynamic_int8", "int8", act="dynamic_int8"),
    QuantConfig("quanto_int2", "int2"),
    QuantConfig("quanto_int4", "int4"),
    QuantConfig("quanto_int8", "int8"),
    QuantConfig("hqq_int3", "hqq_int3"),
    QuantConfig("hqq_int4", "hqq_int4"),
    QuantConfig("hqq_int8", "hqq_int8"),
    # static {int4,int8,float8} weights x {int8,float8} activations — the
    # full 6-combo static matrix (`static_quantization.py:75-107`,
    # `pruning_quantization_all.py:1401-1437`)
    QuantConfig("static_int8_act_int8", "int8", act="static_int8",
                needs_calibration=True),
    QuantConfig("static_int4_act_int8", "int4", act="static_int8",
                needs_calibration=True),
    QuantConfig("static_int8_act_fp8", "int8", act="static_fp8",
                needs_calibration=True),
    QuantConfig("static_int4_act_fp8", "int4", act="static_fp8",
                needs_calibration=True),
    QuantConfig("static_fp8_act_int8", "fp8", act="static_int8",
                needs_calibration=True),
    QuantConfig("static_fp8_act_fp8", "fp8", act="static_fp8",
                needs_calibration=True),
    QuantConfig("static_fp8", "fp8"),
    # reference `evaluation_dynamic.py:177-247` bnb matrix
    QuantConfig("bnb_fp4", "fp4"),
    QuantConfig("bnb_fp4_double_quant", "fp4_dq"),
    QuantConfig("bnb_nf4", "nf4"),
    QuantConfig("bnb_nf4_double_quant", "nf4_dq"),
    QuantConfig("bnb_nf4_bf16_compute", "nf4_dq", dtype="bfloat16"),
]}


def apply_named_config(params: Any, name: str) -> Any:
    return REGISTRY[name].apply(params)


# ---------------------------------------------------------------------------
# Data-aware methods (need a calibration callable, not just weights):
# GPTQ (arXiv:2210.17323), SmoothQuant (arXiv:2211.10438), AWQ
# (arXiv:2306.00978). Beyond-reference: the reference's only data-aware
# step is quanto's static-act observer pass (`model_utils.py:152-214`).
# ---------------------------------------------------------------------------

def _da_gptq(bits: int):
    def f(params, arch, run_cal):
        from .gptq import gptq_quantize_params

        return gptq_quantize_params(params, run_cal, bits=bits)
    return f


def _da_smooth(method: str, act: str | None = None, alpha: float = 0.5):
    def f(params, arch, run_cal):
        from .smooth import smoothquant_params

        smoothed = smoothquant_params(params, arch, run_cal, alpha=alpha)
        return quantize_params(smoothed, method, act=act)
    return f


def _da_awq(method: str):
    def f(params, arch, run_cal):
        from .smooth import awq_quantize_params

        return awq_quantize_params(params, arch, run_cal, method=method)
    return f


DATA_AWARE: dict[str, Callable[..., Any]] = {
    "gptq_int2": _da_gptq(2),
    "gptq_int4": _da_gptq(4),
    "gptq_int8": _da_gptq(8),
    "smoothquant_int4": _da_smooth("int4"),
    "smoothquant_int8": _da_smooth("int8"),
    "smoothquant_w8a8": _da_smooth("int8", act="dynamic_int8"),
    "awq_int4": _da_awq("int4"),
    "awq_nf4": _da_awq("nf4"),
}


def quantize_data_aware(params: Any, arch: Any, name: str,
                        run_calibration: Callable[[Any], Any]) -> Any:
    """Apply DATA_AWARE[name]: run_calibration(params) must drive eager
    full forwards (`evaluation.harness.make_calibration_fn` builds one from
    a calibration split)."""
    try:
        fn = DATA_AWARE[name]
    except KeyError:
        raise KeyError(f"unknown data-aware config {name!r}; "
                       f"have {sorted(DATA_AWARE)}") from None
    return fn(params, arch, run_calibration)
