#!/usr/bin/env python
"""Device time + achieved TFLOP/s of the full-geometry train step.

Measures ONLY the jitted train_step (forward + backward + adamw update,
the device work of scripts/train.py) on synthetic device-resident batches,
blocking on the loss scalar every step — the production loop's pattern
(training/loop.py; free-running dispatch stalls this runtime ~70x).
The training CLI's wall step time on this 1-core host is data-loader-bound
and says nothing about the chip.

Sweeps BOTH compute dtypes (fp32 = CLI default, bf16 = --fp16 /
TrainConfig.bf16 — the reference's Lightning precision=16,
scripts/train.py:23,177) across batch sizes, printing one JSON line per
config with the XLA cost-analysis FLOPs and the achieved fraction of the
chip's 126 TFLOP/s bf16 peak (the segment_profile.py convention; fp32
rows show the same denominator, labeled, since this chip has no separate
fp32 MXU peak worth quoting).

Usage: python benchmarks/train_step_time.py
Env:   OKT_TRAIN_BATCHES=4,8,16  OKT_TRAIN_DTYPES=fp32,bf16  OKT_TRAIN_ITERS
       OKT_TRAIN_MODE=step|fwd|grad — diagnostic segmentation of the step:
       `fwd` times loss_and_metrics only (inference-style forward + loss),
       `grad` times value_and_grad WITHOUT the optimizer update. Comparing
       the three localizes dtype anomalies (e.g. the bf16@4 regression) to
       forward, backward, or the fp32 optimizer/cast tail.
"""

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

BATCHES = [int(b) for b in
           os.environ.get("OKT_TRAIN_BATCHES", "4,8,16,32,64").split(",")]
DTYPES = os.environ.get("OKT_TRAIN_DTYPES", "fp32,bf16").split(",")
ITERS = int(os.environ.get("OKT_TRAIN_ITERS", "30"))
MODE = os.environ.get("OKT_TRAIN_MODE", "step")
WARMUP = 3
PEAK_BF16 = 126e12  # chip peak measured round 2 (CLAUDE.md)


def bench_one(dtype_name: str, batch_size: int) -> dict:
    import functools

    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.training.trainer import (
        create_train_state,
        loss_and_metrics,
        make_optimizer,
        train_step,
    )

    dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
    # full geometry; bf16 compute keeps fp32 params + fp32 loss accumulation
    # exactly like TrainConfig.bf16 (training/loop.py build_model)
    model = KeypointNet(heatmaps_out=3, dtype=dtype)
    size, k, t = 511, 3, 2
    h = w = 64
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, size, size, 3), dtype),
        train=False,
    )
    state = create_train_state(model, variables, make_optimizer(lr=4e-3))

    rng = np.random.default_rng(0)
    batch = {
        "frame": jnp.asarray(rng.normal(size=(batch_size, size, size, 3)), dtype),
        "heatmaps": jnp.asarray(rng.uniform(size=(batch_size, h, w, k)), jnp.float32),
        "depth": jnp.asarray(rng.uniform(size=(batch_size, h, w, k)), jnp.float32),
        "centers": jnp.asarray(rng.normal(size=(batch_size, h, w, t, 2)), jnp.float32),
    }
    key = jax.random.key(1)

    # AOT-compile ONCE and time the compiled object directly: the jit-cache
    # path would compile a second copy of the 24.95M-param program just to
    # read cost_analysis() (AOT lowering does not populate the jit cache).
    # The compiled step keeps trainer.py's state donation, so no extra copy
    # of the train state stays alive during the timed loop.
    if MODE == "fwd":
        @functools.partial(jax.jit, static_argnames=("model",))
        def fwd_step(model, state, batch, key):
            loss, (_, metrics, _) = loss_and_metrics(
                model, state.params, state.batch_stats, batch, True, key)
            return state, metrics

        compiled = fwd_step.lower(model, state, batch, key).compile()
    elif MODE == "grad":
        @functools.partial(jax.jit, static_argnames=("model",))
        def grad_step(model, state, batch, key):
            def loss_fn(params):
                return loss_and_metrics(
                    model, params, state.batch_stats, batch, True, key)

            (loss, (_, metrics, _)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)
            # consume the grads into one scalar so XLA can't DCE the backward
            metrics["grad_norm"] = sum(
                jnp.sum(jnp.square(g)) for g in jax.tree.leaves(grads))
            return state, metrics

        compiled = grad_step.lower(model, state, batch, key).compile()
    else:
        compiled = train_step.lower(model, state, batch, key).compile()
    flops = float("nan")
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", float("nan")))
    except Exception:
        pass

    for _ in range(WARMUP):
        state, metrics = compiled(state, batch, key)
        float(metrics["loss"])  # block per step (axon runtime requirement)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        state, metrics = compiled(state, batch, key)
        float(metrics["loss"])
    dt = (time.perf_counter() - t0) / ITERS

    row = {
        "metric": "train_step_ms" if MODE == "step" else f"train_{MODE}_ms",
        "dtype": dtype_name, "batch": batch_size,
        "ms": round(dt * 1000, 2),
        "steps_per_s": round(1 / dt, 2),
        "frames_per_s": round(batch_size / dt, 1),
    }
    if np.isfinite(flops):
        row["tflops"] = round(flops / 1e12, 2)
        row["achieved_tflops_per_s"] = round(flops / dt / 1e12, 1)
        row["pct_bf16_peak"] = round(100 * flops / dt / PEAK_BF16, 1)
    return row


def main():
    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    for dtype_name in DTYPES:
        for batch_size in BATCHES:
            # one config failing (e.g. batch-64 HBM OOM) must not eat the rest
            try:
                print(json.dumps(bench_one(dtype_name, batch_size)), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"metric": "train_step_ms", "dtype": dtype_name,
                                  "batch": batch_size, "error": repr(e)[:300]}),
                      flush=True)


if __name__ == "__main__":
    main()
