"""Persistent XLA compilation cache.

First compile of the flagship train step on the axon tunnel costs ~20-40 s;
every driver/bench/CLI entry point re-pays it on each process start. JAX's
persistent compilation cache keys compiled executables by (HLO, topology,
compiler version), so enabling it makes every re-run after the first skip
straight to execution — which also shrinks the window an axon relay outage
can interrupt.

Opt-out: set D2S_XLA_CACHE_DIR=off. Override location: D2S_XLA_CACHE_DIR.
"""

from __future__ import annotations

import os

_DEFAULT = os.path.expanduser("~/.cache/dense2sparse_vit_tpu/xla")
_enabled = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX at an on-disk compilation cache; returns the dir or None.

    Safe to call multiple times and before/after backend init. Failures
    (read-only filesystem, older jax) degrade to uncached compilation.
    """
    global _enabled
    env = os.environ.get("D2S_XLA_CACHE_DIR", "")
    if env.lower() in ("off", "0", "none", "disable", "disabled"):
        return None
    # TPU-only: XLA:CPU persists AOT machine code keyed loosely enough that
    # reloads across host-feature detection differences emit SIGILL-risk
    # warnings (cpu_aot_loader). The CPU backend compiles fast anyway; the
    # win is the ~20-40 s flagship TPU compile.
    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        return None
    path = path or env or _DEFAULT
    try:
        import jax

        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # default min_compile_time is 1s; keep it but cache entries of any
        # size (several hot jits here are small but re-dispatched every run)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
        _enabled = True
        return path
    except Exception:
        return None
