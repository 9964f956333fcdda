#!/usr/bin/env python
"""Checkpoint inference visualization — the reference ModelBench.ipynb
semantics (SURVEY.md §4): load a trained artifact, run frames from a
sequence through the serve path, and write predicted-heatmap overlay +
detected-point frames for eyeballing.

Usage:
    python examples/model_bench.py <sequence_dir> --model <export_dir> \
        --keypoints config/valve.json --out /tmp/model_bench
"""

import argparse
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("sequence", help="Encoded sequence directory.")
    parser.add_argument("--model", required=True, help="Serving artifact dir.")
    parser.add_argument("--keypoints", required=True,
                        help="Keypoint topology JSON (config/valve.json).")
    parser.add_argument("--out", default="/tmp/model_bench")
    parser.add_argument("--max-frames", type=int, default=4)
    flags = parser.parse_args()

    import numpy as np
    from matplotlib import pyplot

    from object_keypoints_tpu.data.scene import SceneDataset
    from object_keypoints_tpu.pipeline import LearnedKeypointTrackingPipeline
    from object_keypoints_tpu.utils.vis import heatmap_overlay

    with open(flags.keypoints, "rt") as f:
        keypoint_config = json.load(f)

    ds = SceneDataset(flags.sequence, keypoint_config, include_pose=True)
    offset = SceneDataset.image_offset
    camera = ds.camera.scale(511.0 / 720.0).cut(offset).scale(64.0 / 511.0)

    pipeline = LearnedKeypointTrackingPipeline(
        flags.model, False, [64, 64], None, keypoint_config
    )
    pipeline.reset(camera)

    os.makedirs(flags.out, exist_ok=True)
    for i, example in enumerate(ds):
        if i >= flags.max_frames:
            break
        frame_nchw = np.transpose(example["frame"], (2, 0, 1))[None]
        objects, heatmap = pipeline(frame_nchw)

        rgb = SceneDataset.to_image(example["frame"])
        image = heatmap_overlay(rgb, np.asarray(heatmap[0]), alpha=0.6)
        fig = pyplot.figure(figsize=(8, 8))
        ax = fig.add_subplot(111)
        ax.imshow(image)
        n_pts = 0
        for obj in objects:
            pts = [p for p in obj["keypoints"] if getattr(p, "size", 0)]
            if pts:
                pts = np.concatenate(pts, axis=0) * (511.0 / 64.0)
                ax.scatter(pts[:, 0], pts[:, 1], s=8, c="lime")
                n_pts += len(pts)
        ax.axis("off")
        path = os.path.join(flags.out, f"{i:06d}.jpg")
        fig.savefig(path, bbox_inches="tight")
        pyplot.close(fig)
        print(f"frame {i}: {len(objects)} objects, {n_pts} 2D points -> {path}")


if __name__ == "__main__":
    main()
