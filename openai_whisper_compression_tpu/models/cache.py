"""Static-shape decoder KV cache living in TPU HBM.

Replaces the dynamic `past_key_values` the reference gets from HF `generate`
(`data_utils.py:152`): fixed (B, H, MAX_LEN, Dh) buffers updated in place via
`lax.dynamic_update_slice`, so the whole decode loop stays shape-static and
jit-compiles once.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..config import WhisperArch

Params = dict[str, Any]


def _layer_heads(layer: Params, head_dim: int) -> int:
    from .whisper import _num_heads

    return _num_heads(layer["attn"], head_dim)


def init_cache(params: Params, arch: WhisperArch, batch: int,
               max_len: int | None = None, dtype=jnp.float32,
               int8: bool = False) -> list[dict[str, jax.Array]]:
    """One {k, v} buffer pair per decoder layer. Head count is read from each
    layer's weights so head-pruned layers get smaller caches.

    int8=True stores keys/values as int8 with per-position absmax scales
    (the int8 KV cache of BASELINE.json config 4; the reference has no KV
    compression — HF generate keeps fp caches). Scales are (B, H, S) —
    position on the MINOR dim, matching the (B·H, S) score layout the fused
    step kernel multiplies them into (a trailing unit dim would lane-pad
    64× in VMEM and force a sublane→lane relayout per kernel block)."""
    max_len = max_len or arch.max_target_positions
    cache = []
    for layer in params["decoder"]["layers"]:
        h = _layer_heads(layer, arch.head_dim)
        shape = (batch, h, max_len, arch.head_dim)
        if int8:
            cache.append({
                "k": jnp.zeros(shape, jnp.int8),
                "v": jnp.zeros(shape, jnp.int8),
                "k_scale": jnp.zeros((batch, h, max_len), jnp.float32),
                "v_scale": jnp.zeros((batch, h, max_len), jnp.float32),
            })
        else:
            cache.append({"k": jnp.zeros(shape, dtype),
                          "v": jnp.zeros(shape, dtype)})
    return cache


def _quantize_kv(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Per-(batch, head, position) absmax int8 quantization."""
    scale = jnp.maximum(jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1,
                                keepdims=True), 1e-12) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127)
    return q.astype(jnp.int8), scale


def update(entry: dict[str, jax.Array], k_new: jax.Array, v_new: jax.Array,
           pos: jax.Array) -> dict[str, jax.Array]:
    """Write (B, H, S, Dh) new keys/values at time offset `pos`."""
    zeros = (0, 0, pos, 0)
    if "k_scale" in entry:
        kq, ks = _quantize_kv(k_new)
        vq, vs = _quantize_kv(v_new)
        return {
            "k": lax.dynamic_update_slice(entry["k"], kq, zeros),
            "v": lax.dynamic_update_slice(entry["v"], vq, zeros),
            "k_scale": lax.dynamic_update_slice(entry["k_scale"], ks[..., 0],
                                                zeros[:3]),
            "v_scale": lax.dynamic_update_slice(entry["v_scale"], vs[..., 0],
                                                zeros[:3]),
        }
    return {
        "k": lax.dynamic_update_slice(entry["k"], k_new.astype(entry["k"].dtype), zeros),
        "v": lax.dynamic_update_slice(entry["v"], v_new.astype(entry["v"].dtype), zeros),
    }


def read(entry: dict[str, jax.Array], dtype) -> tuple[jax.Array, jax.Array]:
    """Dequantize (if int8) and return (k, v) in compute dtype."""
    if "k_scale" in entry:
        k = (entry["k"].astype(jnp.float32)
             * entry["k_scale"][..., None]).astype(dtype)
        v = (entry["v"].astype(jnp.float32)
             * entry["v_scale"][..., None]).astype(dtype)
        return k, v
    return entry["k"].astype(dtype), entry["v"].astype(dtype)
