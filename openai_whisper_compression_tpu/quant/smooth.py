"""SmoothQuant + AWQ: activation-aware per-channel smoothing.

Both methods rebalance per-channel dynamic range between activations and
weights at LayerNorm→linear boundaries as an EXACT algebraic rewrite of
the float model: divide the LN affine (scale+bias) by a per-channel vector
`s` and multiply the consumer weight rows by the same `s` — the product
`ln_out @ W` is unchanged, but the rescaled weights/activations quantize
with far less clipping error on outlier channels.

Sites (all LN→linear boundaries in Whisper; other linear inputs are not LN
outputs and cannot be folded without changing the nonlinearity):
  - encoder/decoder `attn_ln`  → self-attention {q, k, v}
  - decoder `cross_ln`         → cross-attention {q} (k/v consume encoder
    output, a different tensor)
  - encoder/decoder `mlp_ln`   → {fc1}

SmoothQuant (arXiv:2211.10438): s_j = amax_x_j^α / amax_w_j^(1-α), fixed α.
AWQ (arXiv:2306.00978): s_j = amax_x_j^α with α grid-searched PER SITE to
minimise the quantized-matmul MSE on captured activation rows.

Calibration statistics come from one eager pass under the capture context
(`utils/capture.py`; the model records LN outputs in
`models/whisper.py::encoder_layer/decoder_layer`). The reference repo has
no counterpart — its 4-bit path is bnb kernels only
(/root/reference/model_utils.py:44-73); smoothing is beyond-reference.
"""
from __future__ import annotations

from typing import Any, Callable

import numpy as np

import jax.numpy as jnp

from ..config import WhisperArch
from ..ops.qtensor import QTensor, dequantize
from ..utils import capture
from .api import _copy_tree

MAX_ROWS = 256  # activation rows kept per site for AWQ's MSE search


def _site_keys(n_enc: int, n_dec: int) -> list[str]:
    keys = []
    for i in range(n_enc):
        keys += [f"encoder.{i}.attn", f"encoder.{i}.mlp"]
    for i in range(n_dec):
        keys += [f"decoder.{i}.attn", f"decoder.{i}.cross",
                 f"decoder.{i}.mlp"]
    return keys


_TAG_OF = {"attn": "attn_ln_out", "cross": "cross_ln_out",
           "mlp": "mlp_ln_out"}


def collect_ln_stats(params: Any, arch: WhisperArch,
                     run_calibration: Callable[[Any], Any]) -> dict:
    """Run `run_calibration(params)` eagerly under capture and aggregate
    per-site stats: {"<site>": {"amax": (d,), "rows": (R, d)}}.

    The calibration callable must drive full forwards
    (`models.whisper.forward` / `decode_logits`) so the record stream is
    the per-pass pattern n_enc×(attn, mlp) + n_dec×(attn, cross, mlp);
    batches must be small enough not to trigger encoder sub-batch chunking.
    """
    with capture.capturing() as store:
        run_calibration(params)
    recs = [r for r in store
            if r["tag"] in ("attn_ln_out", "cross_ln_out", "mlp_ln_out")]
    n_enc = len(params["encoder"]["layers"])
    n_dec = len(params["decoder"]["layers"])
    keys = _site_keys(n_enc, n_dec)
    if not recs or len(recs) % len(keys):
        raise ValueError(
            f"capture stream has {len(recs)} LN records, not a multiple of "
            f"{len(keys)} (= sites/pass); run_calibration must call full "
            "forwards with an unchunked encoder batch")
    stats: dict[str, dict] = {}
    for p in range(len(recs) // len(keys)):
        for k, r in zip(keys, recs[p * len(keys):(p + 1) * len(keys)]):
            if r["tag"] != _TAG_OF[k.rsplit(".", 1)[1]]:
                raise ValueError(f"record stream out of order at {k}: "
                                 f"{r['tag']}")
            amax = np.asarray(r["per_unit_max_abs"], np.float32)
            rows = np.asarray(r["rows"], np.float32)
            if k not in stats:
                stats[k] = {"amax": amax, "rows": rows}
            else:
                stats[k]["amax"] = np.maximum(stats[k]["amax"], amax)
                if len(stats[k]["rows"]) < MAX_ROWS:
                    stats[k]["rows"] = np.concatenate(
                        [stats[k]["rows"], rows])[:MAX_ROWS]
    return stats


def _sites(params: Any) -> list[tuple[str, dict, list[dict]]]:
    """(site_key, ln_param_dict, [consumer linear dicts]) for every
    foldable boundary, in `_site_keys` order."""
    out = []
    for i, layer in enumerate(params["encoder"]["layers"]):
        out.append((f"encoder.{i}.attn", layer["attn_ln"],
                    [layer["attn"]["q"], layer["attn"]["k"],
                     layer["attn"]["v"]]))
        out.append((f"encoder.{i}.mlp", layer["mlp_ln"], [layer["fc1"]]))
    for i, layer in enumerate(params["decoder"]["layers"]):
        out.append((f"decoder.{i}.attn", layer["attn_ln"],
                    [layer["attn"]["q"], layer["attn"]["k"],
                     layer["attn"]["v"]]))
        out.append((f"decoder.{i}.cross", layer["cross_ln"],
                    [layer["cross"]["q"]]))
        out.append((f"decoder.{i}.mlp", layer["mlp_ln"], [layer["fc1"]]))
    return out


def _check_float(consumers: list[dict], key: str) -> None:
    for c in consumers:
        if isinstance(c["w"], QTensor):
            raise ValueError(f"smooth before quantizing: {key} consumer "
                             "weight is already a QTensor")


def _apply_scale(ln: dict, consumers: list[dict], s: np.ndarray) -> None:
    """Fold in place (callers operate on a copied tree): LN affine /= s,
    consumer weight rows *= s. Exact rewrite: (x/s) @ (s·W) == x @ W."""
    sj = jnp.asarray(s, jnp.float32)
    ln["g"] = (jnp.asarray(ln["g"], jnp.float32) / sj).astype(ln["g"].dtype)
    if ln.get("b") is not None:
        ln["b"] = (jnp.asarray(ln["b"], jnp.float32) / sj).astype(
            ln["b"].dtype)
    for c in consumers:
        w = c["w"]
        c["w"] = (jnp.asarray(w, jnp.float32) * sj[:, None]).astype(w.dtype)


def _safe_scale(s: np.ndarray) -> np.ndarray:
    s = np.where(np.isfinite(s) & (s > 0), s, 1.0)
    return np.clip(s, 1e-4, 1e4).astype(np.float32)


def smoothquant_params(params: Any, arch: WhisperArch,
                       run_calibration: Callable[[Any], Any] | None = None,
                       stats: dict | None = None,
                       alpha: float = 0.5) -> Any:
    """SmoothQuant: return a float model numerically equivalent to `params`
    with s_j = amax_x_j^alpha / amax_w_j^(1-alpha) folded at every
    LN→linear boundary. Quantize the result with any REGISTRY method."""
    if stats is None:
        if run_calibration is None:
            raise ValueError("need run_calibration or precollected stats")
        stats = collect_ln_stats(params, arch, run_calibration)
    out = _copy_tree(params)
    for key, ln, consumers in _sites(out):
        _check_float(consumers, key)
        ax = stats[key]["amax"]
        aw = np.max(np.abs(np.concatenate(
            [np.asarray(c["w"], np.float32) for c in consumers],
            axis=1)), axis=1)
        s = _safe_scale(ax ** alpha / np.maximum(aw, 1e-8) ** (1.0 - alpha))
        _apply_scale(ln, consumers, s)
    return out


def _resolve_quantizer(method: str, **kw):
    """method → weight-quantizer callable. Accepts raw QUANTIZERS names and
    REGISTRY config names (resolved to their base method + kwargs), and
    fails BEFORE any expensive calibration with the valid namespaces."""
    from .api import QUANTIZERS, REGISTRY

    if method in QUANTIZERS:
        return lambda w: QUANTIZERS[method](w, **kw)
    cfg = REGISTRY.get(method)
    if cfg is not None and cfg.method in QUANTIZERS:
        merged = {**dict(cfg.kwargs), **kw}
        return lambda w: QUANTIZERS[cfg.method](w, **merged)
    raise KeyError(f"unknown quant method {method!r}; quantizers: "
                   f"{sorted(QUANTIZERS)}; named configs: {sorted(REGISTRY)}")


def _site_quant_error(xs_exact: tuple, ws: list, s: np.ndarray,
                      quantizer) -> float:
    """MSE of the smoothed-then-quantized matmuls vs exact, summed over
    the site's consumers, on captured activation rows. `xs_exact` =
    (x, [x @ w for w in ws]) precomputed once per site — the exact
    products are alpha-invariant."""
    x, exacts = xs_exact
    sj = jnp.asarray(s)
    xs = x / sj[None, :]
    err = 0.0
    for wj, exact in zip(ws, exacts):
        q = quantizer(wj * sj[:, None])
        wq = dequantize(q, jnp.float32)
        err += float(jnp.mean((xs @ wq - exact) ** 2))
    return err


def awq_search(params: Any, arch: WhisperArch,
               run_calibration: Callable[[Any], Any] | None = None,
               stats: dict | None = None,
               method: str = "int4",
               grid: int = 11,
               **quant_kw) -> tuple[Any, dict[str, float]]:
    """AWQ: per-site grid search of alpha in [0, 1] (s_j = amax_x_j^alpha,
    geomean-normalised) minimising quantized-matmul MSE on captured rows;
    returns (smoothed float params, {site: alpha}). alpha=0 ≡ no smoothing,
    so AWQ never does worse than plain quantization on the calibration set.
    """
    quantizer = _resolve_quantizer(method, **quant_kw)   # fail fast
    if stats is None:
        if run_calibration is None:
            raise ValueError("need run_calibration or precollected stats")
        stats = collect_ln_stats(params, arch, run_calibration)
    out = _copy_tree(params)
    alphas: dict[str, float] = {}
    for key, ln, consumers in _sites(out):
        _check_float(consumers, key)
        ax = np.maximum(stats[key]["amax"], 1e-8)
        x = jnp.asarray(stats[key]["rows"], jnp.float32)
        ws = [jnp.asarray(c["w"], jnp.float32) for c in consumers]
        xs_exact = (x, [x @ w for w in ws])   # alpha-invariant, once/site
        best_alpha, best_s, best_err = 0.0, np.ones_like(ax), np.inf
        for alpha in np.linspace(0.0, 1.0, grid):
            s = ax ** alpha
            s = _safe_scale(s / np.exp(np.mean(np.log(np.maximum(s, 1e-8)))))
            err = _site_quant_error(xs_exact, ws, s, quantizer)
            if err < best_err:
                best_alpha, best_s, best_err = float(alpha), s, err
        _apply_scale(ln, consumers, best_s)
        alphas[key] = best_alpha
    return out, alphas


def awq_quantize_params(params: Any, arch: WhisperArch,
                        run_calibration: Callable[[Any], Any],
                        method: str = "int4",
                        grid: int = 11, **quant_kw) -> Any:
    """Convenience: AWQ-smooth then quantize every linear with `method`."""
    from .api import quantize_params

    smoothed, _ = awq_search(params, arch, run_calibration,
                             method=method, grid=grid, **quant_kw)
    return quantize_params(smoothed, method, **quant_kw)
