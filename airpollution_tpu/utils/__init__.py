"""Utilities: profiling, memory tracking, configuration."""

from airpollution_tpu.utils.compile_cache import enable_compilation_cache
from airpollution_tpu.utils.profiling import (
    Timer,
    get_cpu_memory_mb,
    get_device_memory_mb,
    memory_delta,
    profiler_trace,
)

__all__ = [
    "Timer",
    "enable_compilation_cache",
    "get_cpu_memory_mb",
    "get_device_memory_mb",
    "memory_delta",
    "profiler_trace",
]
