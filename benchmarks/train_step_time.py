#!/usr/bin/env python
"""Device time of the full-geometry train step (default batch 8).

Measures ONLY the jitted train_step (forward + backward + adamw update,
the device work of scripts/train.py) on synthetic device-resident batches,
blocking on the loss scalar every step — the production loop's pattern
(training/loop.py; free-running dispatch stalls this runtime ~70x).
The training CLI's wall step time on this 1-core host is data-loader-bound
and says nothing about the chip. Prints one JSON line.

Usage: python benchmarks/train_step_time.py   (env: OKT_TRAIN_BATCH)
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

BATCH = int(os.environ.get("OKT_TRAIN_BATCH", "8"))
ITERS = 30
WARMUP = 3


def main():
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.training.trainer import (
        create_train_state,
        make_optimizer,
        train_step,
    )
    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    model = KeypointNet(heatmaps_out=3)  # full geometry, fp32 (CLI default)
    size, k, t = 511, 3, 2
    h = w = 64
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, size, size, 3)), train=False
    )
    state = create_train_state(model, variables, make_optimizer(lr=4e-3))

    rng = np.random.default_rng(0)
    batch = {
        "frame": jnp.asarray(rng.normal(size=(BATCH, size, size, 3)), jnp.float32),
        "heatmaps": jnp.asarray(rng.uniform(size=(BATCH, h, w, k)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(size=(BATCH, h, w, k)), jnp.float32),
        "centers": jnp.asarray(rng.normal(size=(BATCH, h, w, t, 2)), jnp.float32),
    }
    # call train_step directly — it is already jitted WITH state donation
    # (trainer.py donate_argnames); an outer jax.jit wrapper would retrace
    # it undonated and measure a step that keeps two copies of the
    # 24.95M-param state alive, which is not the production loop's step
    key = jax.random.key(1)
    for _ in range(WARMUP):
        state, metrics = train_step(model, state, batch, key)
        float(metrics["loss"])  # block per step (axon runtime requirement)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = train_step(model, state, batch, key)
        float(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS
    print(json.dumps({
        "metric": "train_step_ms", "batch": BATCH,
        "ms": round(dt * 1000, 2),
        "steps_per_s": round(1 / dt, 2),
        "frames_per_s": round(BATCH / dt, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
