#!/usr/bin/env python
"""Single-batch overfit harness — the reference OverfittingTest.ipynb
semantics (SURVEY.md §4): train on ONE batch for N steps and print the loss
trajectory; the canonical "does training work at all" check.

Runs on CPU or TPU; a tiny model by default, --full for the production
config.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--steps", type=int, default=100)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--full", action="store_true", help="Production-size model.")
    parser.add_argument("--data", default=None,
                        help="Sequence dir for a real batch (default: synthetic).")
    flags = parser.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.training.trainer import (
        create_train_state,
        make_optimizer,
        train_step,
    )

    if flags.full:
        model = KeypointNet(heatmaps_out=3, dropout=0.0)
        size = 511
    else:
        model = KeypointNet(
            heatmaps_out=3, stacks=2, dropout=0.0, levels=2, dims=(16, 16, 32),
            mods=(1, 1, 1), stem_features=(8, 16), cnv_dim=16, features=8,
        )
        size = 64

    if flags.data:
        from object_keypoints_tpu.data.combinators import batched
        from object_keypoints_tpu.data.scene import SceneDataset

        ds = SceneDataset(flags.data, {"keypoint_config": [1, 3]})
        batch = next(batched(ds, 2))
        batch = {k: jnp.asarray(v) for k, v in batch.items()}
    else:
        rng = np.random.default_rng(0)
        h = w = size // 8
        heat = np.zeros((2, h, w, 3), np.float32)
        for c in range(3):
            heat[:, (c * 2 + 1) % h, (c * 3 + 2) % w, c] = 1.0
        batch = {
            "frame": jnp.asarray(rng.normal(size=(2, size, size, 3)), jnp.float32),
            "heatmaps": jnp.asarray(heat),
            "depth": jnp.asarray(heat * 1.5),
            "centers": jnp.zeros((2, h, w, 2, 2), jnp.float32),
        }

    variables = model.init({"params": jax.random.key(0)}, batch["frame"], train=False)
    state = create_train_state(model, variables, make_optimizer(lr=flags.lr,
                                                                plateau_patience=10_000))
    rng_key = jax.random.key(1)
    for step in range(1, flags.steps + 1):
        state, metrics = train_step(model, state, batch, rng_key)
        if step == 1 or step % 10 == 0:
            print(f"step {step:4d}  loss {float(metrics['loss']):.5f}")
    print("overfit check:", "PASS" if float(metrics["loss"]) < 1e3 else "inspect")


if __name__ == "__main__":
    main()
