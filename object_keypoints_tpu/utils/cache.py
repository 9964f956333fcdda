"""Persistent XLA compilation cache.

The full-model train step takes minutes to compile through this
environment's remote AOT compiler; a persistent cache makes every
subsequent process start instantly. Called by the training/bench entry
points; safe no-op if the backend rejects it.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> bool:
    import jax

    path = path or os.environ.get("OKT_JAX_CACHE", "/tmp/okt_jax_cache")
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
