#!/usr/bin/env python
"""End-to-end training throughput at flagship geometry — wall time, not
device time.

VERDICT r4 weak #2: the device step is 67 ms @ batch 8 (train_step_time.py)
but the flagship run averaged ~1.86 s/step wall — a ~4% duty cycle — and no
post-mitigation end-to-end number was ever recorded. This benchmark runs
the REAL training-loop components (SceneDataset -> Chain/SamplingPool ->
batched -> device_prefetch -> trainer.train_step) on synthetic sequences at
flagship geometry and prints per-epoch wall numbers with a breakdown:

- ``data_wait_s``: time the consumer spent blocked on the prefetch queue
  (host decode/augment/render not hidden behind the device step)
- ``step_s``: time from batch-in-hand to loss-ready (device step + transfer
  not already staged + dispatch/block RPC on the tunneled chip)

Epoch 1 pays video decode (~165 ms/frame on this 1-core host); epoch 2+
runs from the decoded-frame cache (the production default in
training/loop.py). The steady-state number is the one that matters for a
long run: duty_cycle = device_step_ms / wall_step_ms.

Usage: python benchmarks/train_e2e.py [--epochs 3] [--frames 50] [--seqs 4]
       [--batch 8] [--features 128] [--bf16]
Writes one JSON line per epoch + a summary line.
"""

import argparse
import json
import os
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--frames", type=int, default=50, help="frames per sequence")
    p.add_argument("--seqs", type=int, default=4, help="training sequences")
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--features", type=int, default=128)
    p.add_argument("--bf16", action="store_true", default=True)
    p.add_argument("--fp32", dest="bf16", action="store_false")
    p.add_argument("--pool", type=int, default=100)
    p.add_argument("--data", default=None,
                   help="existing dataset root (default: generate synthetic)")
    p.add_argument("--device-data", action="store_true",
                   help="Device-resident store path (training/device_data): "
                   "stage frames in HBM once, augment+render in the jitted "
                   "step, ship only indices per step.")
    args = p.parse_args()

    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.data.combinators import Chain, SamplingPool, batched
    from object_keypoints_tpu.data.prefetch import device_prefetch
    from object_keypoints_tpu.training.loop import TrainConfig, _build_sequences, build_model
    from object_keypoints_tpu.training.trainer import (
        create_train_state, make_optimizer, train_step,
    )

    if args.data:
        data_root = os.path.join(args.data, "train")
    else:
        tmp = tempfile.mkdtemp(prefix="okt_e2e_bench_")
        from object_keypoints_tpu.data.synthetic import make_synthetic_dataset_tree

        make_synthetic_dataset_tree(tmp, "config/calibration.yaml", [1, 3],
                                    n_train=args.seqs, n_val=1,
                                    n_frames=args.frames)
        data_root = os.path.join(tmp, "train")

    config = TrainConfig(keypoint_config=[1, 3], batch_size=args.batch,
                         features=args.features, bf16=args.bf16)
    model = build_model(config)
    train_sets = _build_sequences(data_root, config.keypoint_config, seed=1,
                                  augment=True, normalize=False,
                                  cache_frames=True)

    rng = jax.random.key(0)
    sample = next(iter(train_sets[0]))
    variables = model.init({"params": rng},
                           jnp.zeros((1, *sample["frame"].shape), model.dtype),
                           train=False)
    state = create_train_state(model, variables, make_optimizer(lr=4e-3))
    dropout_rng = jax.random.key(1)

    total_frames = sum(len(s) for s in train_sets)
    print(json.dumps({"config": {
        "batch": args.batch, "features": args.features,
        "bf16": args.bf16, "frames": total_frames, "seqs": args.seqs,
        "device_data": args.device_data,
        "platform": jax.devices()[0].platform,
    }}), flush=True)

    store = None
    if args.device_data:
        from object_keypoints_tpu.training.device_data import (
            build_device_store, train_step_device_data,
        )

        t0 = time.perf_counter()
        store = build_device_store(train_sets)
        jax.block_until_ready(store.frames)
        print(json.dumps({"store_build_s": round(time.perf_counter() - t0, 1),
                          "store_mb": round(store.frames.nbytes / 1e6, 1)}),
              flush=True)
        target_config = tuple(train_sets[0].keypoint_config)
        perm_rng = np.random.default_rng(1)

    summary = []
    for epoch in range(args.epochs):
        if store is not None:
            order = perm_rng.permutation(store.n_frames)
            def batches():
                import jax.numpy as _jnp

                for s0 in range(0, store.n_frames - args.batch + 1, args.batch):
                    yield _jnp.asarray(order[s0:s0 + args.batch])
        else:
            def batches():
                chain = Chain(train_sets, shuffle=True, seed=1)
                pooled = SamplingPool(chain, args.pool, seed=1)
                yield from batched(pooled, args.batch)

        it = iter(batches()) if store is not None else device_prefetch(batches())
        data_wait = step_time = 0.0
        steps = 0
        t_epoch = time.perf_counter()
        while True:
            t0 = time.perf_counter()
            try:
                batch = next(it)
            except StopIteration:
                break
            t1 = time.perf_counter()
            if store is not None:
                state, metrics = train_step_device_data(
                    model, state, store, batch, dropout_rng,
                    keypoint_config=target_config,
                )
            else:
                state, metrics = train_step(model, state, batch, dropout_rng)
            jax.block_until_ready(metrics["loss"])
            t2 = time.perf_counter()
            data_wait += t1 - t0
            step_time += t2 - t1
            steps += 1
        wall = time.perf_counter() - t_epoch
        row = {
            "epoch": epoch, "steps": steps,
            "wall_s": round(wall, 2),
            "wall_ms_per_step": round(wall / steps * 1000, 1),
            "data_wait_ms_per_step": round(data_wait / steps * 1000, 1),
            "step_ms_per_step": round(step_time / steps * 1000, 1),
            "frames_per_s": round(steps * args.batch / wall, 1),
        }
        print(json.dumps(row), flush=True)
        summary.append(row)

    steady = summary[-1] if len(summary) == 1 else summary[1:]
    if isinstance(steady, list):
        fps = float(np.mean([r["frames_per_s"] for r in steady]))
        wall_ms = float(np.mean([r["wall_ms_per_step"] for r in steady]))
    else:
        fps, wall_ms = steady["frames_per_s"], steady["wall_ms_per_step"]
    print(json.dumps({
        "metric": "train_e2e_frames_per_s_steady", "value": round(fps, 1),
        "unit": "frames/s", "wall_ms_per_step": round(wall_ms, 1),
    }), flush=True)


if __name__ == "__main__":
    main()
