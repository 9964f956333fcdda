#!/usr/bin/env python
"""Evaluation CLI — reference scripts/eval_model.py parity (headless).

Plays each sequence through the pipeline (learned model or ground-truth
maps), accumulates 3D keypoint errors, prints the rich metric table, and
optionally writes overlay frames with matplotlib (--write; the interactive
hud window of the reference is replaced by frame dumps — no display in this
environment).
"""

import argparse
import json
import os
import pathlib
import random
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def read_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("data", help="Path to dataset folder.")
    parser.add_argument("--model", "-m", type=str, help="Exported model directory.")
    parser.add_argument("--centers", action="store_true", help="Show center predictions.")
    parser.add_argument("--ground-truth", action="store_true",
                        help="Decode labels instead of predictions.")
    parser.add_argument("--keypoints", type=str, default="config/cups.json")
    parser.add_argument("--write", type=str, help="Write overlay frames to folder.")
    parser.add_argument("--cpu", action="store_true", help="(accepted for parity)")
    parser.add_argument("--world", action="store_true",
                        help="Project 3D points instead of 2D detections.")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--fast", action="store_true",
                        help="Batched single-program decode (TPU fast path).")
    parser.add_argument("--batch", type=int, default=8, help="--fast batch size.")
    parser.add_argument("--live", action="store_true",
                        help="Show the overlay in an interactive window (the "
                        "reference's hud view; needs a display — headless "
                        "hosts fall back to --write frame dumps).")
    parser.add_argument("--json", type=str, default=None,
                        help="Also write the summary dict (the rich table's "
                        "numbers, machine-readable) to this path.")
    return parser.parse_args()


def _live_overlay(example, objects, sequence, world):
    """cv2 overlay for the --live window (same content as _write_overlay
    without the matplotlib round-trip)."""
    import cv2

    from object_keypoints_tpu.data.scene import SceneDataset
    from object_keypoints_tpu.utils.vis import heatmap_overlay

    rgb = SceneDataset.to_image(example["frame"])
    image = np.ascontiguousarray(heatmap_overlay(rgb, example["heatmaps"]))
    for obj in objects:
        if world:
            pts = [p for p in obj["p_C"] if p is not None]
            pts = sequence.camera.project(np.concatenate(pts, axis=0)) + 0.5 \
                if pts else []
        else:
            pts = [p + 1.0 for p in obj["keypoints"] if getattr(p, "size", 0)]
            pts = sequence.to_image_points(np.concatenate(pts, axis=0)) \
                if pts else []
        for x, y in np.atleast_2d(np.asarray(pts)).reshape(-1, 2):
            cv2.circle(image, (int(round(x)), int(round(y))), 4, (255, 0, 0), -1)
    return image


def _write_overlay(out_dir, frame_number, example, objects, sequence, world):
    from matplotlib import cm, pyplot
    import cv2

    from object_keypoints_tpu.data.scene import SceneDataset

    rgb = SceneDataset.to_image(example["frame"])
    heat = np.clip(example["heatmaps"].sum(axis=-1), 0, 1)
    heat_img = (cm.inferno(heat) * 255).astype(np.uint8)[..., :3]
    heat_img = cv2.resize(heat_img, rgb.shape[:2][::-1])
    image = (0.3 * rgb + 0.7 * heat_img).astype(np.uint8)

    fig = pyplot.figure(figsize=(8, 8))
    ax = fig.add_subplot(111)
    ax.imshow(image)
    for obj in objects:
        if world:
            pts = [p for p in obj["p_C"] if p is not None]
            if pts:
                pts = sequence.camera.project(np.concatenate(pts, axis=0)) + 0.5
                ax.scatter(pts[:, 0], pts[:, 1], s=6)
        else:
            pts = [p + 1.0 for p in obj["keypoints"] if getattr(p, "size", 0)]
            if pts:
                pts = sequence.to_image_points(np.concatenate(pts, axis=0))
                ax.scatter(pts[:, 0], pts[:, 1], s=6)
    ax.axis("off")
    fig.savefig(os.path.join(out_dir, f"{frame_number:06}.jpg"), bbox_inches="tight")
    pyplot.close(fig)


def main():
    flags = read_args()
    random.seed(flags.seed)

    from object_keypoints_tpu.evaluation import Results, Sequence
    from object_keypoints_tpu.pipeline import (
        LearnedKeypointTrackingPipeline,
        ObjectKeypointPipeline,
    )

    with open(flags.keypoints, "rt") as f:
        keypoint_config = json.load(f)

    if flags.write:
        os.makedirs(flags.write, exist_ok=True)

    sequences = sorted(os.path.join(flags.data, s) for s in os.listdir(flags.data))
    random.shuffle(sequences)

    viewer = None
    if flags.live:
        from object_keypoints_tpu.utils.vis import LiveViewer

        viewer = LiveViewer("eval_model")

    results = Results()
    frame_number = 0
    for seq_path in sequences:
        sequence = Sequence(seq_path, keypoint_config)
        if flags.fast:
            from object_keypoints_tpu.evaluation import evaluate_sequence_fast
            from object_keypoints_tpu.serving.export import load_inference_fn

            seq_results = evaluate_sequence_fast(
                sequence,
                None if flags.ground_truth else load_inference_fn(flags.model),
                keypoint_config, batch_size=flags.batch,
                max_frames=flags.max_frames, ground_truth=flags.ground_truth,
            )
            results.gt_keypoints.extend(seq_results.gt_keypoints)
            results.predicted_keypoints.extend(seq_results.predicted_keypoints)
            results.set_calibration(sequence.camera_small)
            continue
        if flags.ground_truth:
            pipeline = ObjectKeypointPipeline(
                tuple(sequence.prediction_size), sequence.keypoints, keypoint_config
            )
        else:
            assert flags.model, "--model required unless --ground-truth"
            pipeline = LearnedKeypointTrackingPipeline(
                flags.model, not flags.cpu, tuple(sequence.prediction_size),
                sequence.keypoints, keypoint_config,
            )
        pipeline.reset(sequence.camera_small)
        results.set_calibration(sequence.camera_small)

        for i, example in enumerate(sequence.dataset):
            if flags.max_frames is not None and i >= flags.max_frames:
                break
            if flags.ground_truth:
                heat = np.transpose(example["heatmaps"], (2, 0, 1))[None]
                depth = np.transpose(example["depth"], (2, 0, 1))[None]
                centers = np.transpose(example["centers"], (2, 3, 0, 1))[None]
                objects = pipeline(heat, depth, centers)
            else:
                frame = np.transpose(example["frame"], (2, 0, 1))[None]
                objects, _ = pipeline(frame)
            results.add(example["T_WC"], objects, sequence.world_points)
            if flags.write:
                _write_overlay(flags.write, frame_number, example, objects,
                               sequence, flags.world)
            if viewer is not None:
                if not viewer.show(_live_overlay(example, objects, sequence,
                                                 flags.world)):
                    viewer.close()
                    viewer = None  # user quit the window; keep evaluating
            frame_number += 1
    if viewer is not None:
        viewer.close()
    summary = results.print_results()
    if flags.json:
        os.makedirs(os.path.dirname(flags.json) or ".", exist_ok=True)
        with open(flags.json, "wt") as f:
            json.dump({"summary": summary, "data": flags.data,
                       "model": flags.model,
                       "ground_truth": flags.ground_truth,
                       "fast": flags.fast}, f, indent=2)
        print(f"summary written to {flags.json}")


if __name__ == "__main__":
    main()
