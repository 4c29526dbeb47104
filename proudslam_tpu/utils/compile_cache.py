"""Persistent XLA compilation cache.

The axon-tunneled TPU backend compiles remotely at minutes-per-program
latency; caching compiled executables on disk makes every run after the
first start in seconds. Call :func:`enable` before building jitted
functions (bench.py, scripts, graft entry all do).
"""

from __future__ import annotations

import os


def enable(cache_dir: str = "/root/repo/.jax_cache") -> None:
    try:
        import jax
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
