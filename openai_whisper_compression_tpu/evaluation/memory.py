"""Per-batch memory/CPU tracking — TPU port of the reference's
`WhisperMemoryTracker` (`memory_tracker.py:22-212`): psutil CPU%/RSS plus
device memory stats (peak HBM via `device.memory_stats()`, replacing the
reference's `torch.cuda.*` accounting at `memory_tracker.py:88-100`),
a bounded deque of samples, summary roll-up and JSON dump.
"""

from __future__ import annotations

import json
import logging
import os
import time
from collections import deque
from typing import Any

import numpy as np

logger = logging.getLogger("whisper_eval")


def device_memory_stats() -> dict[str, float]:
    """Best-effort HBM stats in MB from the default JAX device."""
    try:
        import jax

        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        scale = 1.0 / (1024 ** 2)
        return {
            "hbm_in_use_mb": stats.get("bytes_in_use", 0) * scale,
            "hbm_peak_mb": stats.get("peak_bytes_in_use", 0) * scale,
            "hbm_limit_mb": stats.get("bytes_limit", 0) * scale,
        }
    except Exception:
        return {}


class MemoryTracker:
    """Samples CPU%/RSS and device HBM per logged batch.

    API mirrors the reference tracker: `log_memory`, `get_memory_summary`,
    `save_metrics`, `print_summary`, `close`.
    """

    def __init__(self, model_name: str, save_path: str | None = None,
                 max_samples: int = 500):
        self.model_name = model_name
        self.save_path = save_path
        self.samples: deque[dict[str, Any]] = deque(maxlen=max_samples)
        self.start_time = time.time()
        self._proc = None
        try:
            import psutil

            self._proc = psutil.Process(os.getpid())
            self._proc.cpu_percent(interval=None)  # prime the counter
        except Exception:
            pass
        self.initial = self._snapshot()

    def _snapshot(self) -> dict[str, Any]:
        snap: dict[str, Any] = {"ts": time.time() - self.start_time}
        if self._proc is not None:
            snap["cpu_percent"] = self._proc.cpu_percent(interval=None)
            snap["rss_mb"] = self._proc.memory_info().rss / (1024 ** 2)
        snap.update(device_memory_stats())
        return snap

    def log_memory(self, split: str | None = None, batch_idx: int | None = None,
                   batch_size: int | None = None, audio_duration: float | None = None,
                   latency: float | None = None) -> None:
        snap = self._snapshot()
        snap.update({k: v for k, v in dict(
            split=split, batch_idx=batch_idx, batch_size=batch_size,
            audio_duration=audio_duration, latency=latency).items()
            if v is not None})
        self.samples.append(snap)

    def get_memory_summary(self) -> dict[str, Any]:
        if not self.samples:
            return {"model": self.model_name, "num_samples": 0}

        def agg(key):
            vals = [s[key] for s in self.samples if key in s]
            if not vals:
                return None
            return {"mean": float(np.mean(vals)), "max": float(np.max(vals)),
                    "min": float(np.min(vals)), "std": float(np.std(vals))}

        return {
            "model": self.model_name,
            "num_samples": len(self.samples),
            "duration_s": time.time() - self.start_time,
            "cpu_percent": agg("cpu_percent"),
            "rss_mb": agg("rss_mb"),
            "hbm_in_use_mb": agg("hbm_in_use_mb"),
            "hbm_peak_mb": agg("hbm_peak_mb"),
            "initial": self.initial,
        }

    def save_metrics(self, path: str | None = None) -> str | None:
        path = path or self.save_path
        if path is None:
            return None
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump({"summary": self.get_memory_summary(),
                       "samples": list(self.samples)}, f, indent=2)
        return path

    def print_summary(self) -> None:
        s = self.get_memory_summary()
        logger.info("memory summary for %s: %s", self.model_name,
                    json.dumps(s, default=str)[:2000])

    def close(self) -> None:
        self.print_summary()
        if self.save_path:
            self.save_metrics()
