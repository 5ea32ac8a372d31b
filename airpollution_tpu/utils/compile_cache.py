"""Persistent XLA compilation cache for the framework's entry points.

First-touch compiles of the big fused programs cost minutes on this
backend (the remote-compile tunnel; CLAUDE.md), and JAX's in-process
compile cache dies with the process. JAX ships a persistent on-disk
cache (keyed on a content hash of the HLO + compile options + compiler
version, so stale hits are impossible) but leaves it off by default;
this module turns it on for the framework.

Measured on this host (257² fused Chebyshev solver, fresh process per
run): cold first-call 769 s / 317 s (tunnel variance); with the cache
populated the first call drops to 140 s and no cache entry is
rewritten — the executable is reloaded, and the residual cost is the
remote backend instantiating it (client-side XLA compilation is
skipped but the tunnel round trip is not).

Auto-enable (the package ``__init__`` call) is scoped to non-CPU
platforms: XLA:CPU persists AOT executables whose recorded machine
features trip the loader's compatibility check even on the compiling
host (E-log spam warning of SIGILL on every cached load, and a real
hazard if the cache directory is shared across machines), and CPU
compiles are cheap enough that the cache buys little there. Passing an
explicit ``path`` — or setting ``APT_COMPILATION_CACHE_DIR`` — opts in
regardless of platform.

Environment:
  APT_COMPILATION_CACHE=0   disable entirely
  APT_COMPILATION_CACHE_DIR opt in on any platform and override the
                            default ``~/.cache/airpollution_tpu/xla``
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "airpollution_tpu", "xla"
)

_enabled_dir: str | None = None
_explicit = False  # opted in via path arg or APT_COMPILATION_CACHE_DIR


def _cpu_only() -> bool:
    """True when JAX is pinned to the CPU platform (config or env)."""
    platforms = None
    try:
        import jax

        platforms = jax.config.jax_platforms
    except Exception:
        pass
    if not platforms:
        platforms = os.environ.get("JAX_PLATFORMS", "")
    names = [p.strip() for p in str(platforms).split(",") if p.strip()]
    return bool(names) and all(n == "cpu" for n in names)


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` (idempotent).

    Returns the cache directory in use, or None when disabled via
    ``APT_COMPILATION_CACHE=0``, when auto-enable is skipped on a
    CPU-only platform (see module docstring), or when the configuration
    fails (old JAX, read-only filesystem, ...) — callers never have to
    handle errors; a missing cache only costs compile time.
    """
    global _enabled_dir, _explicit
    if os.environ.get("APT_COMPILATION_CACHE", "1") == "0":
        return None
    if _enabled_dir is not None and path in (None, _enabled_dir):
        _explicit = _explicit or path is not None
        return _enabled_dir
    explicit = path or os.environ.get("APT_COMPILATION_CACHE_DIR")
    if explicit is None and _cpu_only():
        return None
    cache_dir = explicit or _DEFAULT_DIR
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
    except Exception:
        return None
    _enabled_dir = cache_dir
    _explicit = path is not None or explicit is not None
    return cache_dir


def sync_platform() -> None:
    """Re-evaluate the CPU guard after a platform switch.

    The package ``__init__`` auto-enables at import time, when the
    platform may still be the default (non-CPU) one; a driver that then
    pins JAX to CPU (``experiments/common.configure_platform``, or a
    manual ``jax.config.update("jax_platforms", "cpu")``) would
    otherwise keep persisting XLA:CPU AOT executables. Call this after
    any platform change; it turns the auto-enabled cache off on
    CPU-only platforms while leaving any explicit opt-in alone —
    either an ``enable_compilation_cache(path)`` call or
    ``APT_COMPILATION_CACHE_DIR`` in the environment.
    """
    global _enabled_dir
    if (_enabled_dir is None
            or _explicit
            or os.environ.get("APT_COMPILATION_CACHE_DIR")
            or not _cpu_only()):
        return
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        return
    _enabled_dir = None
