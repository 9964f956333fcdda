"""Evaluation: 3D keypoint error accumulation + the reference metric table.

Rebuild of scripts/eval_model.py's measurement core (Sequence :35-87,
Results :129-232): detected objects match the nearest ground-truth object by
XY center distance, detected points (all coords < 2 m) match the nearest
ground-truth keypoint, out-of-view ground truth is skipped, and the summary
table reports mean err (cm), mean XY err, std, fraction < 3 cm, 25th/75th
percentiles, % missing, point count — printed with rich exactly like the
reference.
"""

from __future__ import annotations

import json
import os
from typing import List, Optional

import numpy as np

from object_keypoints_tpu.data.scene import SceneDataset
from object_keypoints_tpu.geometry import FisheyeCamera, linalg, load_calibration_params


class Sequence:
    """One encoded sequence + the camera chain into prediction space
    (eval_model.py:35-87)."""

    def __init__(self, sequence_path: str, keypoint_config: dict,
                 prediction_size=(64, 64)):
        self.sequence_path = str(sequence_path)
        self.keypoint_config = keypoint_config
        self.prediction_size = np.array(prediction_size)
        self.dataset = SceneDataset(
            self.sequence_path, keypoint_config, augment=False, include_pose=True
        )
        self.size_resized = np.array(
            [SceneDataset.height_resized, SceneDataset.width_resized]
        )
        self.image_offset = SceneDataset.image_offset
        self.scale_prediction_to_image = self.prediction_size / self.size_resized
        self._load_calibration()
        self._read_keypoints()

    def _load_calibration(self):
        calibration_file = os.path.join(self.sequence_path, "calibration.yaml")
        params = load_calibration_params(calibration_file)
        camera = FisheyeCamera(params["K"], params["D"], params["image_size"])
        camera = camera.scale(SceneDataset.height_resized / SceneDataset.height)
        self.camera = camera.cut(self.image_offset)
        scale_small = self.prediction_size[0] / SceneDataset.height_resized
        self.camera_small = camera.cut(self.image_offset).scale(scale_small)

    def _read_keypoints(self):
        self.world_points = self.dataset.world_points.reshape(
            self.dataset.n_objects, self.dataset.n_keypoints, 3
        )
        with open(os.path.join(self.sequence_path, "keypoints.json"), "rt") as f:
            self.keypoints = np.array(json.load(f)["3d_points"])[:, :3]

    def to_image_points(self, predictions):
        return predictions / self.scale_prediction_to_image


class Results:
    """3D error accumulator (eval_model.py:129-232)."""

    def __init__(self):
        self.gt_keypoints: List = []
        self.predicted_keypoints: List = []
        self.camera = None

    def set_calibration(self, camera):
        self.camera = camera

    def add(self, T_WC, objects, scene_points):
        """T_WC: world-from-camera pose; objects: pipeline detections;
        scene_points: (n_objects, n_keypoints, 3) world ground truth."""
        gt_keypoints = []
        keypoints = []
        T_CW = np.asarray(linalg.inv_transform(T_WC))
        scene_points_C = np.asarray(
            linalg.transform_points(T_CW, scene_points.reshape(-1, 3))
        ).reshape(scene_points.shape)
        centers_C = scene_points_C[:, 0]

        for obj in objects:
            p_CK = obj["p_C"]
            if p_CK[0] is None:
                continue
            object_distances = np.linalg.norm(
                centers_C[:, :2] - p_CK[0][0][:2], axis=1
            )
            closest_object = int(object_distances.argmin())
            object_points = scene_points_C[closest_object]

            gt_center = self.camera.project(object_points[0:1])
            if not self.camera.in_frame(gt_center)[0]:
                continue  # object center not in view

            gt_points = []
            object_keypoints = []
            for points in p_CK:
                if points is None:
                    continue
                for point in points:
                    if point is not None and (np.asarray(point) < 2.0).all():
                        closest = np.linalg.norm(object_points - point, axis=1).argmin()
                        gt_point = object_points[closest]
                        projected = self.camera.project(gt_point[None])
                        if not self.camera.in_frame(projected).all():
                            continue  # point not in view
                        object_keypoints.append(np.asarray(point))
                        gt_points.append(gt_point)
                    else:
                        object_keypoints.append(None)
                        gt_points.append(None)
            gt_keypoints.append(gt_points)
            keypoints.append(object_keypoints)
        self.gt_keypoints.append(gt_keypoints)
        self.predicted_keypoints.append(keypoints)

    def summary(self) -> dict:
        errors, errors_xy = [], []
        missing = 0
        n_points = 0
        small_error = 0
        for gt, predicted in zip(self.gt_keypoints, self.predicted_keypoints):
            for gt_points, p_points in zip(gt, predicted):
                for gt_point, p_point in zip(gt_points, p_points):
                    n_points += 1
                    if p_point is not None:
                        err = float(np.linalg.norm(gt_point - p_point))
                        errors.append(err)
                        errors_xy.append(float(np.linalg.norm(gt_point[:2] - p_point[:2])))
                        if err < 0.03:
                            small_error += 1
                    else:
                        missing += 1
        if not n_points:
            return {"n_points": 0}
        errors = np.array(errors) * 100.0  # cm
        errors_xy = np.array(errors_xy) * 100.0
        return {
            "mean_cm": float(errors.mean()) if errors.size else float("nan"),
            "mean_xy_cm": float(errors_xy.mean()) if errors.size else float("nan"),
            "std_cm": float(errors.std()) if errors.size else float("nan"),
            "lt_3cm": small_error / n_points,
            "p25_cm": float(np.percentile(errors, 25)) if errors.size else float("nan"),
            "p75_cm": float(np.percentile(errors, 75)) if errors.size else float("nan"),
            "missing_pct": 100.0 * missing / n_points,
            "n_points": n_points,
        }

    def print_results(self):
        """The reference's rich table (eval_model.py:192-232)."""
        s = self.summary()
        try:
            from rich.console import Console
            from rich.table import Table
        except ImportError:
            print(s)
            return s
        table = Table(show_header=True)
        for col in ("mean", "mean xy", "std", "< 3cm", "25th percentile",
                    "75th percentile", "missing", "points"):
            table.add_column(col)
        if s["n_points"]:
            table.add_row(
                f"{s['mean_cm']}", f"{s['mean_xy_cm']}", f"{s['std_cm']}",
                f"{s['lt_3cm']}", f"{s['p25_cm']}", f"{s['p75_cm']}",
                f"{s['missing_pct']:.02f}%", f"{s['n_points']}",
            )
        Console().print(table)
        return s


def decoded_to_objects(decoded, frame_index: int, keypoint_config) -> List[dict]:
    """Convert one frame of the fixed-shape DecodedObjects batch into the
    reference's list-of-dicts (pipeline.py:186-199 output contract)."""
    center_valid = np.asarray(decoded.center_valid[frame_index])
    centers = np.asarray(decoded.center_points[frame_index])
    center_p3d = np.asarray(decoded.center_p3d[frame_index])
    kps = np.asarray(decoded.keypoints[frame_index])
    kp_valid = np.asarray(decoded.keypoints_valid[frame_index])
    kp_p3d = np.asarray(decoded.keypoints_p3d[frame_index])

    objects = []
    for j in np.nonzero(center_valid)[0]:
        keypoints = [centers[j][None]]
        p_C = [center_p3d[j][None]]
        for t, cap in enumerate(keypoint_config):
            sel = kp_valid[j, t, :cap]
            keypoints.append(kps[j, t, :cap][sel])
            p_C.append(kp_p3d[j, t, :cap][sel] if sel.any() else None)
        objects.append({"p_centers": [], "keypoints": keypoints, "p_C": p_C})
    return objects


def evaluate_sequence_fast(sequence: Sequence, inference_fn, keypoint_config,
                           batch_size: int = 8,
                           max_frames: Optional[int] = None,
                           ground_truth: bool = False) -> Results:
    """Batched single-program eval: frames -> model -> decode_objects_batch
    -> Results. The TPU-native fast path (the per-frame reference path in
    :func:`evaluate_sequence` exists for exact API parity).

    ``ground_truth=True`` skips the model (``inference_fn`` may be None) and
    batches the dataset's rendered GT maps straight into the decode program —
    the batched analog of ``evaluate_sequence(..., ground_truth=True)``
    (reference eval_model.py:274-329 --ground-truth mode)."""
    import jax.numpy as jnp

    from object_keypoints_tpu.pipeline.decode_jit import (
        CameraArrays, decode_objects_batch,
    )

    cam = sequence.camera_small
    camera = CameraArrays(
        K=jnp.asarray(cam.K, jnp.float32), D=jnp.asarray(cam.D, jnp.float32),
        Kinv=jnp.asarray(cam.Kinv, jnp.float32),
        image_size=jnp.asarray(cam.image_size, jnp.float32),
    )
    config = tuple(keypoint_config["keypoint_config"])
    results = Results()
    results.set_calibration(cam)

    frames, poses = [], []
    for i, example in enumerate(sequence.dataset):
        if max_frames is not None and i >= max_frames:
            break
        if ground_truth:
            # reference layout: maps (K,H,W), offsets (T,2,H,W)
            frames.append((
                np.transpose(example["heatmaps"], (2, 0, 1)),
                np.transpose(example["depth"], (2, 0, 1)),
                np.transpose(example["centers"], (2, 3, 0, 1)),
            ))
        else:
            frames.append(example["frame"])
        poses.append(example["T_WC"])

    for start in range(0, len(frames), batch_size):
        chunk = frames[start : start + batch_size]
        # keep the jit shape stable: pad the tail chunk up to batch_size
        pad = batch_size - len(chunk)
        padded = chunk + [chunk[-1]] * pad
        if ground_truth:
            heat = np.stack([c[0] for c in padded])
            depth = np.stack([c[1] for c in padded])
            centers = np.stack([c[2] for c in padded])
        else:
            nchw = np.transpose(np.stack(padded), (0, 3, 1, 2))
            heat, depth, centers = inference_fn(jnp.asarray(nchw))
        decoded = decode_objects_batch(
            jnp.asarray(heat), jnp.asarray(depth), jnp.asarray(centers),
            camera, config, model=cam.distortion_model, max_peaks=16,
        )
        for k in range(len(chunk)):
            objects = decoded_to_objects(decoded, k, config)
            results.add(poses[start + k], objects, sequence.world_points)
    return results


def evaluate_sequence(sequence: Sequence, pipeline, ground_truth: bool = False,
                      max_frames: Optional[int] = None) -> Results:
    """Play a sequence through a pipeline and accumulate Results
    (eval_model.py:274-329 minus rendering)."""
    results = Results()
    results.set_calibration(sequence.camera_small)
    pipeline.reset(sequence.camera_small)
    for i, example in enumerate(sequence.dataset):
        if max_frames is not None and i >= max_frames:
            break
        if ground_truth:
            heat = np.transpose(example["heatmaps"], (2, 0, 1))[None]
            depth = np.transpose(example["depth"], (2, 0, 1))[None]
            centers = np.transpose(example["centers"], (2, 3, 0, 1))[None]
            objects = pipeline(heat, depth, centers)
        else:
            frame = np.transpose(example["frame"], (2, 0, 1))[None]
            objects, _ = pipeline(frame)
        results.add(example["T_WC"], objects, sequence.world_points)
    return results
