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
    parser.add_argument("--quantize", action="store_true",
                        help="Calibrate and store int8 activation scales with the "
                             "artifact (TPU serving runs ~1.3x faster; no reference "
                             "analog — the TorchScript trace is fp16/fp32 only).")
    parser.add_argument("--calibration-data", type=str, default=None,
                        help="Directory of encoded sequences to calibrate on "
                             "(defaults to unit-normal frames).")
    parser.add_argument("--calibration-frames", type=int, default=16)
    return parser.parse_args()


def _calibration_batches(flags, keypoint_config, input_size=511):
    import numpy as np

    frames = []
    if flags.calibration_data:
        import os

        from object_keypoints_tpu.data.scene import SceneDataset

        seqs = sorted(
            os.path.join(flags.calibration_data, d)
            for d in os.listdir(flags.calibration_data)
            if os.path.isdir(os.path.join(flags.calibration_data, d))
        )
        for seq in seqs:
            for example in SceneDataset(
                seq, {"keypoint_config": keypoint_config}, augment=False
            ):
                frames.append(np.asarray(example["frame"], np.float32))
                if len(frames) >= flags.calibration_frames:
                    break
            if len(frames) >= flags.calibration_frames:
                break
    if not frames:  # normalized-image proxy: unit-normal matches RGB_MEAN/STD stats
        rng = np.random.default_rng(0)
        frames = list(
            rng.normal(size=(flags.calibration_frames, input_size, input_size, 3)).astype(
                np.float32
            )
        )
    return [np.stack(frames[i : i + 4]) for i in range(0, len(frames), 4)]


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
    ckpt = CheckpointManager(flags.model)
    restored = ckpt.restore(flags.which)
    variables = {"params": restored["params"], "batch_stats": restored["batch_stats"]}

    quant_scales = None
    if flags.quantize:
        from object_keypoints_tpu.serving.quantize import calibrate_activation_scales

        model = model_from_config(model_config, dtype=jnp.bfloat16)
        # eager apply: the interceptor must see concrete values, not tracers
        quant_scales = calibrate_activation_scales(
            lambda b: model.apply(variables, jnp.asarray(b, jnp.bfloat16), train=False),
            _calibration_batches(flags, keypoint_config),
        )

    export_model(flags.out, model_config, variables, quant_scales=quant_scales)
    print(json.dumps({
        "out": flags.out,
        "step": int(restored["step"]),
        "quantized_convs": len(quant_scales) if quant_scales else 0,
    }))


if __name__ == "__main__":
    main()
