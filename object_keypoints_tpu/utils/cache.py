"""Persistent XLA compilation cache.

The full-model train step takes minutes to compile through this
environment's remote AOT compiler; a persistent cache makes every
subsequent process start instantly. Called by the training/bench entry
points; safe no-op if the backend rejects it.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = None) -> bool:
    """Opt-in via OKT_JAX_CACHE=<dir> (or pass a path).

    Measured on this environment: cache *writes* slow first compiles down
    severely through the remote compiler (346 s vs ~60 s for the inference
    graph) while hits only halve the cost — so defaults to off; enable when many
    processes will reuse identical graphs."""
    import jax

    path = path or os.environ.get("OKT_JAX_CACHE")
    if not path:
        return False
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        return True
    except Exception:
        return False
