"""Gating logic of the persistent XLA compilation cache (utils/compile_cache)."""

import os

from dense2sparse_vit_tpu.utils import compile_cache


def _with_env(monkeypatch, **env):
    for k, v in env.items():
        if v is None:
            monkeypatch.delenv(k, raising=False)
        else:
            monkeypatch.setenv(k, v)


def test_disabled_on_cpu_backend(monkeypatch):
    """XLA:CPU AOT reloads are machine-feature-fragile (SIGILL-risk loader
    errors) — the cache must stay off when pinned to the CPU backend."""
    _with_env(monkeypatch, JAX_PLATFORMS="cpu", D2S_XLA_CACHE_DIR=None)
    assert compile_cache.enable_compilation_cache() is None


def test_opt_out(monkeypatch):
    _with_env(monkeypatch, JAX_PLATFORMS=None, D2S_XLA_CACHE_DIR="off")
    assert compile_cache.enable_compilation_cache() is None


def test_enabled_with_custom_dir(monkeypatch, tmp_path):
    d = str(tmp_path / "xla")
    _with_env(monkeypatch, JAX_PLATFORMS=None, D2S_XLA_CACHE_DIR=d)
    got = compile_cache.enable_compilation_cache()
    assert got == d
    assert os.path.isdir(d)
    # back out for the rest of the suite: this process runs on the CPU
    # backend where the cache must stay off
    import jax

    jax.config.update("jax_compilation_cache_dir", None)
