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
from ..ops.qtensor import QTensor

Params = dict[str, Any]


def _layer_heads(layer: Params, head_dim: int) -> int:
    w = layer["attn"]["q"]["w"]
    out_dim = w.shape[1] if isinstance(w, QTensor) else w.shape[-1]
    return out_dim // head_dim


def init_cache(params: Params, arch: WhisperArch, batch: int,
               max_len: int | None = None, dtype=jnp.float32,
               kv_dtype=None) -> list[dict[str, jax.Array]]:
    """One {k, v} buffer pair per decoder layer. Head count is read from each
    layer's weights so head-pruned layers get smaller caches.

    kv_dtype: storage dtype (e.g. jnp.int8 is handled by quant.kv_cache which
    wraps this with scales); default = compute dtype."""
    max_len = max_len or arch.max_target_positions
    kv_dtype = kv_dtype or dtype
    cache = []
    for layer in params["decoder"]["layers"]:
        h = _layer_heads(layer, arch.head_dim)
        shape = (batch, h, max_len, arch.head_dim)
        cache.append({"k": jnp.zeros(shape, kv_dtype),
                      "v": jnp.zeros(shape, kv_dtype)})
    return cache


def update(entry: dict[str, jax.Array], k_new: jax.Array, v_new: jax.Array,
           pos: jax.Array) -> dict[str, jax.Array]:
    """Write (B, H, S, Dh) new keys/values at time offset `pos`."""
    zeros = (0, 0, pos, 0)
    return {
        "k": lax.dynamic_update_slice(entry["k"], k_new.astype(entry["k"].dtype), zeros),
        "v": lax.dynamic_update_slice(entry["v"], v_new.astype(entry["v"].dtype), zeros),
    }
