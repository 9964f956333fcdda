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
                        help="Directory of encoded sequences to calibrate on. "
                             "Default: the checkpoint's recorded training dir "
                             "(hparams), falling back to unit-normal frames "
                             "only when no real data is reachable.")
    parser.add_argument("--calibration-frames", type=int, default=16)
    parser.add_argument("--calibration-percentile", type=float, default=None,
                        help="Clip activation scales at this percentile of "
                             "|x| instead of max-abs (e.g. 99.9; "
                             "outlier-robust).")
    parser.add_argument("--per-channel", action="store_true",
                        help="Per-input-channel activation scales (folded "
                             "into the int8 kernels).")
    return parser.parse_args()


def _calibration_batches(flags, keypoint_config, data_dirs, input_size=511):
    """Real frames from the first reachable directory in ``data_dirs``
    (--calibration-data, then the checkpoint's recorded train/val dirs);
    unit-normal frames only as the last resort (max-abs on random data is
    the flimsiest possible calibration — fine for random-weight throughput
    benches, not for serving a real model)."""
    import numpy as np

    from object_keypoints_tpu.serving.calibration import (
        calibration_batches,
        collect_calibration_frames,
    )

    frames = collect_calibration_frames(
        data_dirs, keypoint_config, n_frames=flags.calibration_frames
    )
    if frames is None:  # normalized-image proxy: unit-normal matches RGB_MEAN/STD stats
        print("package_model: no calibration data reachable; "
              "falling back to unit-normal frames", file=sys.stderr)
        rng = np.random.default_rng(0)
        frames = list(
            rng.normal(size=(flags.calibration_frames, input_size, input_size, 3)).astype(
                np.float32
            )
        )
    return calibration_batches(frames)


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
        data_dirs = [flags.calibration_data, hparams.get("train"), hparams.get("val")]
        # eager apply: the interceptor must see concrete values, not tracers
        quant_scales = calibrate_activation_scales(
            lambda b: model.apply(variables, jnp.asarray(b, jnp.bfloat16), train=False),
            _calibration_batches(flags, keypoint_config, data_dirs),
            percentile=flags.calibration_percentile,
            per_channel=flags.per_channel,
        )

    export_model(flags.out, model_config, variables, quant_scales=quant_scales)
    print(json.dumps({
        "out": flags.out,
        "step": int(restored["step"]),
        "quantized_convs": len(quant_scales) if quant_scales else 0,
    }))


if __name__ == "__main__":
    main()
