"""GPipe-style pipeline parallelism for the encoder stack.

New first-class component with no reference counterpart (the reference is
single-device — SURVEY.md §2c): whisper-large's 32-layer encoder can be
split across a 'pp' mesh axis when one chip's HBM can't hold the model (or
to compose with tp/dp on a slice). Classic GPipe schedule, TPU-native:

- per-layer parameters are STACKED into (L, ...) arrays and sharded on the
  leading dim over 'pp', so every stage holds L/P contiguous layers;
- the batch is split into M microbatches; a differentiable `lax.scan` runs
  M+P-1 ticks, each stage applying its layers (a nested scan) and handing
  its activation to the next stage via `lax.ppermute` over ICI;
- stage 0 injects microbatches, the last stage collects outputs, and a
  final `psum` broadcasts the result (bubble fraction = (P-1)/(M+P-1)).

The conv stem / positions / final LN stay replicated outside the pipeline
(they are <1% of encoder FLOPs).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax, shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import WhisperArch
from ..models.whisper import encoder_layer, gelu, layer_norm, _conv1d


def stack_layers(layers: list[dict]) -> Any:
    """List of per-layer pytrees -> one pytree of (L, ...) stacked leaves.
    Requires homogeneous layers (no per-layer structural pruning)."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def make_pp_encoder(arch: WhisperArch, mesh: Mesh, n_micro: int | None = None):
    """Build (fn, place_layers) for a pipeline-parallel encoder forward.

    fn(stem_params, stacked_layers, ln_params, mel) -> (B, T, d) encoder
    states, replicated on every device. `place_layers` shards the stacked
    layer pytree over 'pp'. Batch must be divisible by n_micro (default 2x
    the stage count, a reasonable bubble/memory trade)."""
    assert "pp" in mesh.axis_names, "mesh needs a 'pp' axis"
    p_stages = mesh.shape["pp"]
    n_micro = n_micro or 2 * p_stages

    def place_layers(stacked: Any) -> Any:
        sh = NamedSharding(mesh, P("pp"))
        return jax.tree.map(lambda x: jax.device_put(x, sh), stacked)

    @partial(shard_map, mesh=mesh,
             in_specs=(P(), P("pp"), P(), P()), out_specs=P())
    def pipeline(stem, local_layers, ln, x):
        s = lax.axis_index("pp")
        m, mb, t, d = x.shape  # (M, B/M, T, d) microbatched, replicated

        def apply_stage(act):
            def layer_body(h, lp):
                return encoder_layer(lp, h, arch.head_dim), None
            out, _ = lax.scan(layer_body, act, local_layers)
            return out

        def tick(carry, tk):
            cur, outs = carry
            # stage 0 injects microbatch tk (garbage past M, masked later)
            inject = jnp.where(s == 0,
                               lax.dynamic_index_in_dim(
                                   x, jnp.minimum(tk, m - 1), 0,
                                   keepdims=False),
                               jnp.zeros_like(cur))
            cur = jnp.where(s == 0, inject, cur)
            y = apply_stage(cur)
            # last stage stores microbatch (tk - (P-1)) when it is real
            mi = tk - (p_stages - 1)
            store = jnp.logical_and(s == p_stages - 1,
                                    jnp.logical_and(mi >= 0, mi < m))
            outs = lax.dynamic_update_index_in_dim(
                outs,
                jnp.where(store, y, lax.dynamic_index_in_dim(
                    outs, jnp.maximum(mi, 0), 0, keepdims=False)),
                jnp.maximum(mi, 0), 0)
            # hand activation to the next stage over ICI
            nxt = lax.ppermute(y, "pp",
                               [(i, (i + 1) % p_stages)
                                for i in range(p_stages)])
            return (nxt, outs), None

        # shard_map vma typing: loop carries become device-varying inside
        # the scan, so the constant-initialized carries are cast up front
        cur0 = lax.pcast(jnp.zeros((mb, t, d), x.dtype), ("pp",),
                         to="varying")
        outs0 = lax.pcast(jnp.zeros((m, mb, t, d), x.dtype), ("pp",),
                          to="varying")
        (_, outs), _ = lax.scan(tick, (cur0, outs0),
                                jnp.arange(m + p_stages - 1))
        # broadcast the last stage's collected outputs to every device
        outs = lax.psum(jnp.where(s == p_stages - 1, outs,
                                  jnp.zeros_like(outs)), "pp")
        return outs

    def fn(stem: dict, stacked_layers: Any, ln: dict,
           mel: jax.Array) -> jax.Array:
        x = gelu(_conv1d(mel, stem["conv1"]["w"], stem["conv1"]["b"],
                         stride=1))
        x = gelu(_conv1d(x, stem["conv2"]["w"], stem["conv2"]["b"], stride=2))
        x = x.transpose(0, 2, 1)
        x = x + stem["pos"][: x.shape[1]].astype(x.dtype)
        b = x.shape[0]
        assert b % n_micro == 0, f"batch {b} % microbatches {n_micro} != 0"
        xm = x.reshape(n_micro, b // n_micro, *x.shape[1:])
        out = pipeline(stem, stacked_layers, ln, xm)
        out = out.reshape(b, *out.shape[2:])
        return layer_norm(out, ln)

    return fn, place_layers


def pp_encode(params: dict, arch: WhisperArch, mesh: Mesh, mel: jax.Array,
              n_micro: int | None = None) -> jax.Array:
    """Convenience: run the encoder pipeline-parallel from standard params
    (stacks + shards layers on the fly; use make_pp_encoder + place_layers
    to amortize placement across calls)."""
    enc = params["encoder"]
    n_layers = len(enc["layers"])
    assert n_layers % mesh.shape["pp"] == 0, \
        f"{n_layers} layers not divisible by pp={mesh.shape['pp']}"
    fn, place = make_pp_encoder(arch, mesh, n_micro)
    stacked = place(stack_layers(enc["layers"]))
    stem = {"conv1": enc["conv1"], "conv2": enc["conv2"], "pos": enc["pos"]}
    return fn(stem, stacked, enc["ln"], mel)
