"""Persistent-compilation-cache plumbing (utils/compile_cache.py)."""

import jax
import pytest

from airpollution_tpu.utils import compile_cache


@pytest.fixture
def restore_cache_config():
    prev_dir = compile_cache._enabled_dir
    prev_explicit = compile_cache._explicit
    prev_cfg = jax.config.jax_compilation_cache_dir
    yield
    compile_cache._enabled_dir = prev_dir
    compile_cache._explicit = prev_explicit
    jax.config.update("jax_compilation_cache_dir", prev_cfg)


def test_enable_points_jax_at_the_directory(tmp_path, restore_cache_config):
    target = str(tmp_path / "xla")
    got = compile_cache.enable_compilation_cache(target)
    assert got == target
    assert jax.config.jax_compilation_cache_dir == target
    # Idempotent: re-enabling the same path is a no-op, and a bare
    # enable() sticks with the configured directory.
    assert compile_cache.enable_compilation_cache(target) == target
    assert compile_cache.enable_compilation_cache() == target


def test_env_opt_out(tmp_path, restore_cache_config, monkeypatch):
    monkeypatch.setenv("APT_COMPILATION_CACHE", "0")
    assert compile_cache.enable_compilation_cache(str(tmp_path)) is None


def test_auto_enable_skips_cpu_only_platform(restore_cache_config,
                                             monkeypatch):
    # The test suite pins jax_platforms to "cpu" (conftest), so the
    # argument-less auto-enable must be a no-op here (XLA:CPU AOT
    # loader spam / SIGILL hazard — module docstring) ...
    monkeypatch.delenv("APT_COMPILATION_CACHE_DIR", raising=False)
    compile_cache._enabled_dir = None
    assert compile_cache._cpu_only()
    assert compile_cache.enable_compilation_cache() is None


def test_sync_platform_disables_auto_cache_on_cpu(tmp_path,
                                                  restore_cache_config,
                                                  monkeypatch):
    # Simulate: auto-enabled under the non-CPU default platform, then the
    # driver switches to CPU (experiments/common.configure_platform).
    monkeypatch.delenv("APT_COMPILATION_CACHE_DIR", raising=False)
    target = str(tmp_path / "xla")
    compile_cache._enabled_dir = target
    compile_cache._explicit = False
    jax.config.update("jax_compilation_cache_dir", target)
    compile_cache.sync_platform()
    assert compile_cache._enabled_dir is None
    assert jax.config.jax_compilation_cache_dir is None


def test_sync_platform_keeps_explicit_path_opt_in(tmp_path,
                                                  restore_cache_config,
                                                  monkeypatch):
    # An explicit enable_compilation_cache(path) call is an opt-in
    # "regardless of platform" (module contract) — sync_platform must
    # not silently discard it even with the env var unset.
    monkeypatch.delenv("APT_COMPILATION_CACHE_DIR", raising=False)
    target = str(tmp_path / "xla")
    compile_cache._enabled_dir = None
    compile_cache._explicit = False
    assert compile_cache.enable_compilation_cache(target) == target
    compile_cache.sync_platform()
    assert compile_cache._enabled_dir == target
    assert jax.config.jax_compilation_cache_dir == target


def test_sync_platform_keeps_explicit_env_opt_in(tmp_path,
                                                 restore_cache_config,
                                                 monkeypatch):
    target = str(tmp_path / "xla")
    monkeypatch.setenv("APT_COMPILATION_CACHE_DIR", target)
    compile_cache._enabled_dir = target
    jax.config.update("jax_compilation_cache_dir", target)
    compile_cache.sync_platform()
    assert compile_cache._enabled_dir == target
    assert jax.config.jax_compilation_cache_dir == target


def test_env_dir_opts_in_on_cpu(tmp_path, restore_cache_config,
                                monkeypatch):
    # ... while an explicit directory (env or argument) opts in anywhere.
    target = str(tmp_path / "xla")
    monkeypatch.setenv("APT_COMPILATION_CACHE_DIR", target)
    compile_cache._enabled_dir = None
    assert compile_cache.enable_compilation_cache() == target
    assert jax.config.jax_compilation_cache_dir == target
