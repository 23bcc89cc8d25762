"""Multi-host (DCN) initialization.

The reference is single-process (SURVEY.md §2c); multi-host sweeps on TPU
pods initialize JAX's distributed runtime so `jax.devices()` spans hosts and
the same pjit/GSPMD code scales over DCN. This is the thin entry point —
all communication stays inside XLA collectives.
"""

from __future__ import annotations

import os


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> dict:
    """Initialize jax.distributed from args or the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID; TPU pods
    usually auto-detect). No-op when single-process."""
    import jax

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if num_processes is None:
        num_processes = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if num_processes <= 1 and coordinator_address is None:
        return {"initialized": False, "processes": 1,
                "devices": len(jax.devices())}
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id if process_id is not None else int(
            os.environ.get("JAX_PROCESS_ID", "0")))
    return {"initialized": True, "processes": num_processes,
            "process_id": jax.process_index(),
            "devices": len(jax.devices()),
            "local_devices": len(jax.local_devices())}
