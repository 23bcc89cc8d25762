"""Compression -> speed curve: the thesis's structured-compression story
told with REAL on-chip throughput (VERDICT r2 next-step #5).

The reference sweeps structured pruning configs and reports WER + a
THEORETICAL GFLOPs reduction (`/root/reference/pruning+quantization/
pruning_quantization_all.py:1392-1460`; FLOPs model at
`unstructured_L1_baseline.py:100-177`) — it cannot measure speed because
masked pruning doesn't accelerate torch. Here every rung is PHYSICAL
surgery (smaller matmuls, smaller KV caches), so each point carries a
measured RTFx alongside agreement-vs-dense and stored size:

    dense -> int8 -> +head-prune 25% -> 50% -> +FFN shrink 50%
          -> +decoder layer drop      (each optionally + recovery distill)

One command: `cli curve --model small --batch 32` -> curve.json (+ plot).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Callable

import numpy as np

from ..config import DecodeConfig, WhisperArch

Transform = Callable[[Any, WhisperArch], tuple[Any, WhisperArch]]


def _heads(amount: float):
    def f(p, a):
        from ..prune.structured import prune_heads_by_l1

        # arch stays fixed: head counts are derived from local weight
        # widths downstream (head_dim must keep d_model//encoder_heads)
        return prune_heads_by_l1(p, a, amount, physical=True), a
    return f


def _ffn(amount: float):
    def f(p, a):
        from ..prune.structured import shrink_ffn

        for comp in ("encoder", "decoder"):
            for li in range(len(p[comp]["layers"])):
                p = shrink_ffn(p, comp, li, amount)
        return p, a
    return f


def _drop_decoder(frac: float):
    def f(p, a):
        from ..prune.structured import drop_layers

        n = len(p["decoder"]["layers"])
        k = max(1, int(n * frac))
        p = drop_layers(p, "decoder", list(range(n - k, n)))
        return p, a.replace(decoder_layers=n - k)
    return f


def _chain(*fns):
    def f(p, a):
        for fn in fns:
            p, a = fn(p, a)
        return p, a
    return f


def ladder(quant: str = "int8") -> list[tuple[str, Transform, bool, dict]]:
    """(name, transform, lossy, cfg_kw) rungs. `lossy` rungs with no
    cfg_kw are eligible for the optional recovery-distillation variant
    (decode-time knobs — the cfg_kw rungs — are not weight-recoverable).

    cfg_kw are DecodeConfig overrides; "cross_kv_merge_frac" resolves to
    cross_kv_merge = frac * S at run time (S is arch-dependent). The
    pool2/tome rungs are encoder token merging (models/merge.py): the
    decode-side lossy lever that halves the per-step cross-KV stream —
    the measured decode bottleneck (DESIGN.md §8) the weight-side rungs
    cannot touch."""
    ident: Transform = lambda p, a: (p, a)
    return [
        ("dense", ident, False, {}),
        (quant, ident, False, {}),
        (f"pool2+{quant}", ident, True, {"cross_kv_pool": 2}),
        (f"tome25%+{quant}", ident, True, {"cross_kv_merge_frac": 0.25}),
        (f"heads25+{quant}", _heads(0.25), True, {}),
        (f"heads50+{quant}", _heads(0.50), True, {}),
        (f"heads50+ffn50+{quant}", _chain(_heads(0.50), _ffn(0.50)), True,
         {}),
        (f"heads50+ffn50+pool2+{quant}",
         _chain(_heads(0.50), _ffn(0.50)), True, {"cross_kv_pool": 2}),
        (f"declayers-25%+{quant}", _drop_decoder(0.25), True, {}),
    ]


def _recovery_pool(teacher, arch: WhisperArch, agree_cfg: DecodeConfig,
                   n_samples: int, pool: int = 32, seq_len: int = 16):
    """(mels (P, M, F), tokens (P, L), teacher_logits (P, L, V))
    distillation pool: fresh same-distribution synthetic mels (seed
    distinct from the agreement set's) + the dense teacher's greedy
    rollouts over them (prefix + generated), truncated to seq_len
    conditioning positions. Teacher logits are precomputed HERE, once for
    the whole pool — the teacher is frozen across every rung and step, so
    re-deriving its forward inside each distill step would pay its
    compile + run cost hundreds of times for identical values."""
    import jax
    import jax.numpy as jnp

    from ..audio import features
    from ..models.decode import greedy_decode
    from ..models.whisper import decode_logits, encode

    rng = np.random.default_rng(1234)
    mels = features.preprocess(
        jnp.asarray(rng.standard_normal((pool, n_samples)) * 0.1,
                    jnp.float32), arch.num_mel_bins,
        length=n_samples).astype(jnp.float32)
    # ONE jitted program per phase (the old eager encode/greedy loop
    # dispatched hundreds of per-op executions through the tunnel per
    # pool slice — the verify-notes trap). The teacher params MUST be an
    # ARGUMENT, not a closure: closed-over pytrees bake into the program
    # as constants, and a 461 MB-of-constants compile request is exactly
    # what the remote compile service rejects (measured: "HTTP 413:
    # length limit exceeded") or times out on ("Broken pipe" ~25 min in).
    tfwd = jax.jit(lambda tp, m, t: decode_logits(
        tp, arch, t, encode(tp, arch, m)))
    roll = jax.jit(lambda tp, m: greedy_decode(
        tp, arch, encode(tp, arch, m), agree_cfg)[0])
    toks, logits = [], []
    for i in range(0, pool, 8):
        t = roll(teacher, mels[i: i + 8])
        t16 = jnp.asarray(np.asarray(t)[:, :seq_len], jnp.int32)
        toks.append(np.asarray(t16))
        logits.append(np.asarray(tfwd(teacher, mels[i: i + 8], t16),
                                 np.float32))
    return (np.asarray(mels), np.concatenate(toks, axis=0),
            np.concatenate(logits, axis=0))


def _measure_rtfx(params, arch, cfg, batch: int, iters: int = 3,
                  avg_utt_s: float = 7.42) -> float:
    """Fenced fixed-token decode throughput (bench.py accounting): EOT
    suppressed so every rung does identical token work."""
    import jax.numpy as jnp

    from ..evaluation.harness import make_transcribe_fn

    fn = make_transcribe_fn(arch, cfg, fast_mel=True)
    rng = np.random.default_rng(0)
    wav = jnp.asarray(rng.standard_normal((batch, 480_000)) * 0.1,
                      jnp.float32)
    np.asarray(fn(params, wav)[0])        # compile + warmup
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        np.asarray(fn(params, wav)[0])    # host readback = timing fence
        times.append(time.perf_counter() - t0)
    return batch * avg_utt_s / float(np.median(times))


def run_curve(params, arch: WhisperArch, *, quant: str = "int8",
              batch: int = 32, tokens: int = 25, iters: int = 3,
              agreement_samples: int = 8, recover_steps: int = 0,
              kv_int8: bool = True, cross_kv_int8: bool = True,
              rungs: list[str] | None = None,
              progress=print, on_point=None) -> list[dict]:
    """Measure every ladder rung on the attached backend.

    rungs: optional name filter (substring match) selecting a subset of
    the ladder. recover_steps > 0 adds a `+recover` variant for each lossy rung
    (KL recovery distillation against the dense teacher, then requant —
    cli._run_recovery_ladder semantics with pruned-mask preservation).

    Returns a list of point dicts: {name, rtfx, size_mb, hbm_mb,
    token_agreement, mean_kl, params_m, [recovered: {...}]}.
    """
    import jax.numpy as jnp

    from ..audio import features
    from ..evaluation.harness import samples_for_arch

    n = samples_for_arch(arch)
    rng = np.random.default_rng(1)
    mels = features.preprocess(
        jnp.asarray(rng.standard_normal((agreement_samples, n)) * 0.1,
                    jnp.float32), arch.num_mel_bins,
        length=n).astype(jnp.float32)
    # notimestamps: the timestamp-rules decode graph compiles
    # pathologically slowly through the remote compile service (the only
    # programs whose compiles exceeded ~25 min this session all contained
    # it, and the tunnel drops connections at that horizon); plain
    # transcription agreement measures the same compression fidelity
    agree_cfg = DecodeConfig(max_new_tokens=min(tokens, 16),
                             language_token_id=None, task_token_id=None,
                             notimestamps=True)

    points: list[dict] = []
    # teacher-only recovery pool; built once, shared by every recovery
    # rung (boxed so _run_rung can fill it lazily)
    _pool_box: list = [None]
    for name, transform, lossy, cfg_kw in ladder(quant):
        if rungs is not None and not any(r in name for r in rungs):
            continue
        try:
            _run_rung(name, transform, lossy, cfg_kw, params, arch, quant,
                      batch, tokens, iters, recover_steps, kv_int8,
                      cross_kv_int8, agree_cfg, mels, n, points, progress,
                      _pool_box)
        except Exception as e:  # noqa: BLE001 — rung fault isolation:
            # one flaky rung (tunnel drop, OOM) must not lose the sweep
            progress(f"# curve {name}: FAILED {e!r}")
            points.append({"name": name, "error": repr(e)})
        if on_point is not None:
            on_point(points)
    return points


def _run_rung(name, transform, lossy, cfg_kw, params, arch, quant, batch,
              tokens, iters, recover_steps, kv_int8, cross_kv_int8,
              agree_cfg, mels, n, points, progress, _pool_box) -> None:
    import jax.numpy as jnp

    from ..evaluation.agreement import model_agreement
    from ..evaluation.memory import analytic_hbm_mb
    from ..models.params import size_in_mb
    from ..quant.api import quantize_params

    def count_params(p):
        from ..ops.qtensor import QTensor

        import jax

        total = 0
        for leaf in jax.tree.leaves(
                p, is_leaf=lambda x: isinstance(x, QTensor)):
            total += (int(np.prod(leaf.shape)) if isinstance(leaf, QTensor)
                      else int(np.prod(np.shape(leaf))))
        return total

    if True:
        p2, a2 = transform(params, arch)
        ckw = dict(cfg_kw)
        frac = ckw.pop("cross_kv_merge_frac", None)
        if frac is not None:
            # resolve the merge fraction against this arch's encoder
            # length (bipartite cap: r <= S // 2)
            s = a2.max_source_positions
            ckw["cross_kv_merge"] = min(int(s * frac), s // 2)
        variants = [("", p2)]
        if lossy and not cfg_kw and recover_steps > 0:
            from ..distill import distill

            # physical surgery leaves no masks to preserve; recovery is
            # KL distillation toward the dense teacher ON-TRAJECTORY:
            # minibatches pair fresh same-distribution mels with the
            # TEACHER'S OWN greedy rollouts, so the loss concentrates on
            # exactly the contexts greedy agreement is scored on (random
            # token contexts — the default — spend capacity on states the
            # decode never visits). Decode-time cfg_kw rungs have no
            # weights to recover.
            if _pool_box[0] is None:
                _pool_box[0] = _recovery_pool(params, arch, agree_cfg, n,
                                              pool=32, seq_len=16)
            pool_m, pool_t, pool_l = _pool_box[0]
            def batch_fn(r, _m=pool_m, _t=pool_t, _l=pool_l):
                idx = r.integers(0, _m.shape[0], size=8)
                return _m[idx], _t[idx], _l[idx]

            # compute_dtype=f32: adamw at lr 1e-4 underflows bf16 weight
            # updates, and the f32 STEP program stays small (teacher
            # hoisted) — unlike f32 rollout/measure programs, whose giant
            # compiles the remote compile service breaks on (measured
            # twice this session: "remote_compile: Broken pipe" ~20+ min
            # into the f32 greedy compile). The curve therefore measures
            # in the caller's dtype (bf16 recommended) and optimizes f32.
            dense_rec, hist = distill(p2, params, a2,
                                      steps=recover_steps, lr=1e-4,
                                      temperature=1.0,
                                      batch_fn=batch_fn,
                                      preserve_sparsity=False,
                                      compute_dtype=jnp.float32)
            progress(f"# curve {name}+recover: distill loss "
                     f"{hist[0]:.4f} -> {hist[-1]:.4f} "
                     f"({recover_steps} steps)")
            variants.append(("+recover", dense_rec))
        base_entry = None
        for suffix, pv in variants:
            q = pv if name == "dense" else quantize_params(pv, quant)
            cfg = DecodeConfig(
                max_new_tokens=tokens, kv_int8=kv_int8,
                cross_kv_int8=cross_kv_int8,
                suppress_tokens=(arch.eos_token_id,), **ckw)
            rtfx = _measure_rtfx(q, a2, cfg, batch, iters)
            ag = model_agreement(
                params, q, a2, mels, agree_cfg,
                comp_cfg=dataclasses.replace(agree_cfg, **ckw)
                if ckw else None) \
                if name != "dense" else {"token_agreement": 1.0,
                                         "top1_agreement": 1.0,
                                         "mean_kl": 0.0,
                                         "logit_rel_err": 0.0}
            s_full = a2.max_source_positions
            cross_s = (s_full - ckw.get("cross_kv_merge", 0)
                       if ckw.get("cross_kv_merge")
                       else -(-s_full // ckw.get("cross_kv_pool", 1)))
            entry = {
                "name": name + suffix,
                "rtfx": round(rtfx, 2),
                "size_mb": round(size_in_mb(q), 1),
                "hbm_mb": round(analytic_hbm_mb(
                    q, a2, batch, kv_int8=kv_int8,
                    cross_kv_bytes=1.0 if cross_kv_int8 else 2.0,
                    cache_len=64, cross_s=cross_s), 0),
                "params_m": round(count_params(q) / 1e6, 1),
                **{k: round(v, 4) for k, v in ag.items()},
            }
            progress(f"# curve {entry['name']}: rtfx={entry['rtfx']} "
                     f"size={entry['size_mb']}MB "
                     f"agree={entry['token_agreement']}")
            if suffix == "":
                base_entry = entry
                points.append(entry)
            else:
                base_entry["recovered"] = entry


def plot_curve(points: list[dict], path: str) -> None:
    """RTFx-vs-size scatter with agreement coloring (matplotlib Agg)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 4.5))
    points = [p for p in points if "error" not in p]  # fault-isolated rungs
    xs = [p["size_mb"] for p in points]
    ys = [p["rtfx"] for p in points]
    cs = [p["token_agreement"] for p in points]
    sc = ax.scatter(xs, ys, c=cs, cmap="viridis", vmin=0, vmax=1, s=60,
                    zorder=3)
    for p in points:
        ax.annotate(p["name"], (p["size_mb"], p["rtfx"]), fontsize=7,
                    xytext=(4, 4), textcoords="offset points")
        if "recovered" in p:
            r = p["recovered"]
            ax.scatter([r["size_mb"]], [r["rtfx"]], marker="^", s=50,
                       c=[r["token_agreement"]], cmap="viridis", vmin=0,
                       vmax=1, zorder=3)
    ax.set_xlabel("stored size (MB)")
    ax.set_ylabel("RTFx (fixed-token decode)")
    ax.set_title("structured compression ladder: size vs throughput "
                 "(color = token agreement vs dense)")
    fig.colorbar(sc, label="token agreement")
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(path, dpi=120)
    plt.close(fig)
