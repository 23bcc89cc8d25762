"""Persistent XLA compilation cache wiring.

Whisper-small programs take 2-4 minutes to compile through a tunnelled
TPU backend (bench.py measured 142-247 s compile+warmup per process).
JAX's persistent cache keys serialized executables by HLO and works
through PJRT, so every process after the first pays seconds instead:
measured on this backend, the batch-8 encoder went 35.4 s -> 4.1 s
across processes.

Opt-out with OWC_NO_COMPILE_CACHE=1 (e.g. when benchmarking compile
itself); relocate with JAX_COMPILATION_CACHE_DIR.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_persistent_compilation_cache(cache_dir: str | None = None,
                                        min_secs: float = 1.0) -> str | None:
    """Point jax at an on-disk compilation cache (idempotent, safe to call
    before or after backend init — config reads happen at compile time).
    Returns the cache dir, or None when disabled via OWC_NO_COMPILE_CACHE."""
    if os.environ.get("OWC_NO_COMPILE_CACHE"):
        return None
    import jax

    # first-configurer wins: a bare enable() (e.g. `import ...cli` from a
    # test or a library user who set their own dir) must NOT re-point a
    # cache someone already configured — only an EXPLICIT dir overrides
    current = getattr(jax.config, "jax_compilation_cache_dir", None)
    if cache_dir is None and current:
        return current
    cache_dir = (cache_dir or os.environ.get("JAX_COMPILATION_CACHE_DIR")
                 or DEFAULT_DIR)
    try:
        os.makedirs(cache_dir, exist_ok=True)
        # threshold first: if the dir update below fails the cache stays
        # inactive (no dir), never half-configured. Default 1 s catches
        # everything that hurts interactively while keeping trivial jits
        # out; tests pass a lower min_secs (many sub-second compiles).
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_secs)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        return None                     # unwritable dir / old jax: run uncached
    return cache_dir
