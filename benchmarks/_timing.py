"""Shared device-timing helper for the benchmark scripts.

One copy of the warmup / block / iterate loop so the repo's hard-won axon
timing rules stay in one place (CLAUDE.md perf notes):

- block_until_ready on the LAST output after the timed loop — per-iteration
  blocking would serialize dispatch and understate pipelined throughput;
- this dispatch-loop pattern can OVERSTATE on runtimes whose
  block_until_ready returns early. bench.py's headline measurement
  cross-checks it against a data-dependent lax.scan chain + np.asarray
  fetch (measured honest on this runtime: 758 chained vs 817 pipelined
  pairs/s); for per-op A/B comparisons like these scripts, the same
  pattern on both sides keeps the ratio meaningful either way.

Scripts keep their own WARMUP/ITERS constants (they are part of each
experiment's documented recipe) and pass them in.
"""

import time


def time_fn(f, *args, warmup: int = 3, iters: int = 20) -> float:
    """Mean seconds per call of ``f(*args)`` after ``warmup`` calls."""
    import jax

    out = None
    for _ in range(warmup):
        out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters
