"""Parameter pytree construction and utilities.

The model is purely functional: parameters live in a nested-dict pytree
(layers are Python lists, so layer count / per-layer head count are static
under `jit` and can be *physically shrunk* by structured pruning — unlike the
reference's masked `torch.nn.utils.prune` reparameterization which keeps dense
shapes, cf. reference `unstructured_L1_baseline.py:500-529`).

Weight layout: linear weights are (in_dim, out_dim) — transposed from torch —
so the hot contraction is a plain `x @ w` that XLA tiles onto the MXU.
Conv-stem weights keep torch's (out, in, width) layout for direct
`lax.conv_general_dilated` use.
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import WhisperArch
from ..ops.qtensor import QTensor

Params = dict[str, Any]


def sinusoid_positions(length: int, channels: int, max_timescale: float = 10000.0) -> np.ndarray:
    """Whisper encoder sinusoidal positions: concat(sin, cos) layout
    (matches HF `sinusoids`, transformers modeling_whisper)."""
    assert channels % 2 == 0
    log_inc = math.log(max_timescale) / (channels // 2 - 1)
    inv = np.exp(-log_inc * np.arange(channels // 2))
    t = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)


def _linear(key, in_dim, out_dim, std, dtype, bias=True):
    p = {"w": jax.random.normal(key, (in_dim, out_dim), dtype) * std}
    if bias:
        p["b"] = jnp.zeros((out_dim,), dtype)
    return p


def _ln(d, dtype):
    return {"g": jnp.ones((d,), dtype), "b": jnp.zeros((d,), dtype)}


def _attn(key, d, dtype, std):
    kq, kk, kv, ko = jax.random.split(key, 4)
    return {
        "q": _linear(kq, d, d, std, dtype),
        "k": _linear(kk, d, d, std, dtype, bias=False),
        "v": _linear(kv, d, d, std, dtype),
        "o": _linear(ko, d, d, std, dtype),
    }


def init_params(arch: WhisperArch, key: jax.Array | None = None,
                dtype=jnp.float32, std: float = 0.02) -> Params:
    """Random-init parameter pytree matching HF WhisperForConditionalGeneration
    layout semantics (init_std normal for linears/embeddings, zeros bias,
    unit layernorm, sinusoidal encoder positions).

    For big models prefer `init_params_jit` — eager per-leaf RNG dispatch is
    slow on tunnelled TPU backends (hundreds of leaves)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    d, ffn = arch.d_model, arch.ffn_dim
    keys = iter(jax.random.split(key, 8 + 8 * (arch.encoder_layers + arch.decoder_layers)))

    def enc_layer():
        return {
            "attn": _attn(next(keys), d, dtype, std),
            "attn_ln": _ln(d, dtype),
            "fc1": _linear(next(keys), d, ffn, std, dtype),
            "fc2": _linear(next(keys), ffn, d, std, dtype),
            "mlp_ln": _ln(d, dtype),
        }

    def dec_layer():
        p = enc_layer()
        p["cross"] = _attn(next(keys), d, dtype, std)
        p["cross_ln"] = _ln(d, dtype)
        return p

    encoder = {
        "conv1": {
            "w": jax.random.normal(next(keys), (d, arch.num_mel_bins, 3), dtype) * std,
            "b": jnp.zeros((d,), dtype),
        },
        "conv2": {
            "w": jax.random.normal(next(keys), (d, d, 3), dtype) * std,
            "b": jnp.zeros((d,), dtype),
        },
        "pos": jnp.asarray(sinusoid_positions(arch.max_source_positions, d), dtype),
        "layers": [enc_layer() for _ in range(arch.encoder_layers)],
        "ln": _ln(d, dtype),
    }
    decoder = {
        "embed": jax.random.normal(next(keys), (arch.vocab_size, d), dtype) * std,
        "pos": jax.random.normal(next(keys), (arch.max_target_positions, d), dtype) * std,
        "layers": [dec_layer() for _ in range(arch.decoder_layers)],
        "ln": _ln(d, dtype),
    }
    return {"encoder": encoder, "decoder": decoder}


import functools  # noqa: E402


@functools.partial(jax.jit, static_argnames=("arch", "dtype", "std"))
def _init_params_jit(arch: WhisperArch, key: jax.Array, dtype, std):
    return init_params(arch, key, dtype, std)


def init_params_jit(arch: WhisperArch, key: jax.Array | None = None,
                    dtype=jnp.float32, std: float = 0.02) -> Params:
    """One-compile whole-tree init (fast for large models on remote TPU)."""
    if key is None:
        key = jax.random.PRNGKey(0)
    return _init_params_jit(arch, key, jnp.dtype(dtype), std)


# ---------------------------------------------------------------------------
# Introspection utilities (≈ reference notebook `ModelProfiler`,
# `openai_whisper_compression/utils.py:16-160`).
# ---------------------------------------------------------------------------

def leaf_count(params: Params) -> int:
    """Total logical parameter count (quantized leaves count logical size)."""
    total = 0
    for leaf in jax.tree.leaves(params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            total += int(np.prod(leaf.shape))
        else:
            total += leaf.size
    return total


def size_in_bytes(params: Params) -> int:
    """Physical in-memory size (quantized leaves count packed bytes)."""
    total = 0
    for leaf in jax.tree.leaves(params, is_leaf=lambda x: isinstance(x, QTensor)):
        if isinstance(leaf, QTensor):
            total += leaf.nbytes()
        else:
            total += leaf.size * leaf.dtype.itemsize
    return total


def size_in_mb(params: Params) -> float:
    return size_in_bytes(params) / (1024 ** 2)


def disk_size_in_mb(params: Params, compressed: bool = False) -> float:
    """Serialized on-disk size (≈ reference `get_model_disk_size_in_mb`,
    `model_utils.py:217-230`, which torch-saves the state dict). compressed
    uses the npz-deflate format; plain uses raw bytes."""
    if not compressed:
        return size_in_mb(params)
    import os
    import tempfile

    from ..storage.formats import save_npz

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "m.npz")
        save_npz(params, path)
        return os.path.getsize(path) / (1024 ** 2)


def named_leaves(params: Params, prefix: str = "") -> list[tuple[str, Any]]:
    """Flat (dotted-name, leaf) pairs, e.g. 'decoder.layers.3.attn.q.w'."""
    out: list[tuple[str, Any]] = []
    if isinstance(params, dict):
        for k, v in params.items():
            out.extend(named_leaves(v, f"{prefix}{k}."))
    elif isinstance(params, (list, tuple)):
        for i, v in enumerate(params):
            out.extend(named_leaves(v, f"{prefix}{i}."))
    else:
        out.append((prefix[:-1], params))
    return out


def get_leaf(params: Params, name: str):
    node = params
    for part in name.split("."):
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    return node


def set_leaf(params: Params, name: str, value) -> None:
    parts = name.split(".")
    node = params
    for part in parts[:-1]:
        node = node[int(part)] if isinstance(node, (list, tuple)) else node[part]
    last = parts[-1]
    if isinstance(node, list):
        node[int(last)] = value
    else:
        node[last] = value


def tree_cast(params: Params, dtype) -> Params:
    """Cast float leaves to dtype (leaves QTensors and int leaves alone)."""
    def cast(x):
        if isinstance(x, QTensor):
            return x
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x.astype(dtype)
        return x
    return jax.tree.map(cast, params, is_leaf=lambda x: isinstance(x, QTensor))
