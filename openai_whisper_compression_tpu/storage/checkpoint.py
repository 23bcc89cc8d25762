"""Model checkpointing (production path).

The compressed research formats live in storage.formats; this is the plain
fast checkpoint for params pytrees — Orbax when available (async, sharded,
the standard JAX production choice), with the npz format as fallback.
Replaces the reference's `save_pretrained` / `torch.save(state_dict)`
(`openai_whisper_compression/utils.py:258-268`).
"""

from __future__ import annotations

import os
from typing import Any

from .formats import load_npz, save_npz


def save(params: Any, path: str) -> str:
    """path: directory (orbax) or *.npz file (fallback)."""
    if path.endswith(".npz"):
        save_npz(params, path)
        return path
    try:
        import orbax.checkpoint as ocp

        path = os.path.abspath(path)
        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(path, params, force=True)
        return path
    except Exception:
        p = path.rstrip("/") + ".npz"
        save_npz(params, p)
        return p


def load(path: str) -> Any:
    if path.endswith(".npz"):
        return load_npz(path)
    import orbax.checkpoint as ocp

    ckptr = ocp.PyTreeCheckpointer()
    return ckptr.restore(os.path.abspath(path))
