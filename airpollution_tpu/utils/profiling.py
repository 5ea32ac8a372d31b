"""Profiling and memory tracking utilities.

Counterpart of the references's ad-hoc observability (SURVEY.md section 5.1):
wall-clock spans around solve/train (crbe.py:418-431, pinn.py:165), psutil
RSS tracking (pinn_experiments.py:51-52) and
``torch.cuda.max_memory_allocated`` (pinn_experiments.py:46-49). The TPU
additions: device (HBM) memory via ``Device.memory_stats()`` and a
``jax.profiler`` trace context for deep dives.
"""

from __future__ import annotations

import contextlib
import time


def get_cpu_memory_mb() -> float:
    """Process RSS in MB (pinn_experiments.py:51-52 semantics)."""
    try:
        import psutil

        return psutil.Process().memory_info().rss / 1e6
    except Exception:
        return 0.0


def get_device_memory_mb() -> float:
    """Accelerator bytes-in-use in MB (the reference's GPU-memory column,
    pinn_experiments.py:46-49; here HBM via Device.memory_stats)."""
    try:
        import jax

        stats = jax.local_devices()[0].memory_stats()
        if stats:
            return stats.get("bytes_in_use", 0) / 1e6
    except Exception:
        pass
    return 0.0


class Timer:
    """Wall-clock span with a throughput helper."""

    def __init__(self):
        self.elapsed = 0.0
        self._start = None

    def __enter__(self):
        self._start = time.time()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.time() - self._start
        return False

    def rate(self, n: int) -> float:
        return n / self.elapsed if self.elapsed > 0 else float("inf")


@contextlib.contextmanager
def memory_delta():
    """Yields a dict filled on exit with cpu/device memory deltas in MB."""
    out = {"cpu_memory_usage_MB": 0.0, "gpu_memory_usage_MB": 0.0}
    cpu0 = get_cpu_memory_mb()
    dev0 = get_device_memory_mb()
    try:
        yield out
    finally:
        out["cpu_memory_usage_MB"] = get_cpu_memory_mb() - cpu0
        out["gpu_memory_usage_MB"] = max(0.0, get_device_memory_mb() - dev0)


@contextlib.contextmanager
def profiler_trace(log_dir: str | None):
    """Optional jax.profiler trace (TPU-native counterpart of the missing
    profiler integration noted in SURVEY.md section 5.1)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
