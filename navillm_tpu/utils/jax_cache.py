"""Persistent XLA compilation cache.

Shape-bucketed jit (prompt-length buckets x batch sizes) means dozens of
compilations per run; with the remote-compile tunnel each costs minutes.
The on-disk cache makes every compilation one-time per machine.
"""
from __future__ import annotations

import os

_enabled = False


def enable_compilation_cache(cache_dir: str | None = None):
    global _enabled
    if _enabled:
        return
    # remote-compile setups (axon relay) build executables on a different
    # machine profile; cached CPU AOT artifacts then trip feature-mismatch
    # loads (potential SIGILL) — skip the disk cache there
    if os.environ.get("PALLAS_AXON_REMOTE_COMPILE") == "1":
        _enabled = True
        return
    import jax
    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/navillm_tpu/jax_cache"))
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        _enabled = True
    except Exception:
        pass    # older jax or unsupported backend: run uncached
