#!/usr/bin/env python
"""Model packaging CLI — reference scripts/package_model.py parity.

Loads a training checkpoint directory (training/checkpoints layout: best/
last + hparams.json) and writes the serving artifact (serving/export
layout) that pipeline.InferenceComponent consumes — the analog of the
reference's TorchScript trace with the (sigmoid heatmap, depth, centers)
contract (package_model.py:26-42)."""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", type=str, required=True,
                        help="Checkpoint directory (containing best/ and hparams.json).")
    parser.add_argument("--out", type=str, required=True, help="Output artifact directory.")
    parser.add_argument("--which", default="best", choices=["best", "last"])
    return parser.parse_args()


def main():
    flags = read_args()

    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.serving.export import export_model, model_from_config
    from object_keypoints_tpu.training.checkpoints import CheckpointManager

    hparams = CheckpointManager.load_hparams(flags.model)
    keypoint_config = hparams["keypoint_config"]
    model_config = {
        "heatmaps_out": len(keypoint_config) + 1,
        "features": hparams.get("features", 128),
        "dropout": hparams.get("dropout", 0.1),
        "keypoint_config": keypoint_config,
        **(hparams.get("model_overrides") or {}),
    }
    del jax, jnp, model_from_config  # config-only path; restore is untyped
    ckpt = CheckpointManager(flags.model)
    restored = ckpt.restore(flags.which)
    export_model(
        flags.out, model_config,
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
    )
    print(json.dumps({"out": flags.out, "step": int(restored["step"])}))


if __name__ == "__main__":
    main()
