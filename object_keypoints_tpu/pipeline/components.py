"""Inference pipeline components — reference-API host wrappers.

Public surface mirrors perception/pipeline.py plus the *stereo* components
the reference's tests document but its current code dropped
(test/test_pipeline.py imports TriangulationComponent / AssociationComponent
which don't exist in perception/pipeline.py — restored here as first-class
APIs per SURVEY.md §4).

The heavy lifting is jitted (pipeline.decode_jit, ops.*, geometry.*); these
classes only convert between masked fixed-shape device arrays and the
reference's ragged list-of-dicts host format.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from object_keypoints_tpu.geometry import stereo as stereo_ops
from object_keypoints_tpu.ops import decode as decode_ops
from object_keypoints_tpu.ops import associate as assoc_ops
from object_keypoints_tpu.pipeline.decode_jit import CameraArrays, decode_objects


def _as_numpy(x):
    if hasattr(x, "detach"):  # torch tensor
        x = x.detach().cpu().numpy()
    return np.asarray(x)


class InferenceComponent:
    """Runs the exported model artifact. Reference pipeline.py:13-28 loads a
    TorchScript file; here the artifact is a directory written by
    serving.export (params + config) loaded into a jitted apply, or any
    callable ``frames -> (heatmaps, depth, centers)``."""

    name = "inference"

    def __init__(self, model, cuda: bool = True):
        # `cuda` kept for signature parity; device placement is JAX's job.
        del cuda
        if callable(model):
            self.model = model
        else:
            from object_keypoints_tpu.serving.export import load_inference_fn

            self.model = load_inference_fn(model)

    def __call__(self, frames):
        heatmaps, depth, centers = self.model(jnp.asarray(_as_numpy(frames)))
        return np.asarray(heatmaps), np.asarray(depth), np.asarray(centers)


class KeypointExtractionComponent:
    """Sub-pixel peak extraction. Reference pipeline.py:30-91.

    __call__ accepts one batch (returns ``(points, confidences)``) or two
    batches — the stereo form used by the reference tests — returning
    ``((points_l, conf_l), (points_r, conf_r))``.

    Output format parity: ``points[frame][channel]`` is a list of (2,)
    arrays in (x, y); ``confidences[frame][channel]`` the matching scores.
    """

    name = "keypoints"
    PROBABILITY_CUTOFF = 0.1  # declared-but-unused in the reference too (pipeline.py:32)

    def __init__(self, keypoint_config, prediction_size, bandwidth: float = 1.0,
                 max_peaks: int = 32, threshold: float = 0.5):
        del bandwidth  # reference accepts-and-ignores it beyond clustering experiments
        self.keypoint_config = [1] + list(keypoint_config["keypoint_config"])
        self.n_keypoints = sum(self.keypoint_config)
        self.prediction_size = tuple(prediction_size)
        self.max_peaks = max_peaks
        self.threshold = threshold

    def _extract_batch(self, frames):
        frames = _as_numpy(frames).astype(np.float32)
        assert frames.shape[1] == len(self.keypoint_config), (
            f"expected {len(self.keypoint_config)} channels, got {frames.shape[1]}"
        )
        pts, conf, valid = decode_ops.extract_peaks_batch(
            jnp.asarray(frames), max_peaks=self.max_peaks, threshold=self.threshold
        )
        pts, conf, valid = np.asarray(pts), np.asarray(conf), np.asarray(valid)
        keypoints, confidences = [], []
        for n in range(frames.shape[0]):
            frame_points, frame_conf = [], []
            for c in range(frames.shape[1]):
                sel = valid[n, c]
                frame_points.append([p for p in pts[n, c][sel]])
                frame_conf.append([s for s in conf[n, c][sel]])
            keypoints.append(frame_points)
            confidences.append(frame_conf)
        return keypoints, confidences

    def __call__(self, *frame_batches):
        results = [self._extract_batch(frames) for frames in frame_batches]
        if len(results) == 1:
            return results[0]
        return tuple(results)


class ObjectExtraction:
    """Center-offset association + capacity resolution.

    Reference pipeline.py:93-153; the dense jitted versions live in
    ops.associate. Returns the reference's list-of-dicts.
    """

    def __init__(self, keypoint_config, prediction_size, reject_distance: float = 20.0):
        self.keypoint_config = list(keypoint_config["keypoint_config"])
        self.prediction_size = tuple(prediction_size)
        self.reject_distance = reject_distance

    def __call__(self, keypoints, confidence, centers):
        if len(keypoints[0]) == 0:
            return []
        center_points = np.stack(keypoints[0])
        T = len(keypoints) - 1
        # fixed capacity: rounding up to a power of two keeps the jitted
        # assignment's shapes stable across frames (no per-frame recompiles)
        needed = max([len(k) for k in keypoints] + [1])
        M = 1 << (needed - 1).bit_length()
        pts = np.zeros((T, M, 2), np.float32)
        conf = np.zeros((T, M), np.float32)
        valid = np.zeros((T, M), bool)
        for t in range(T):
            for m, p in enumerate(keypoints[1 + t]):
                pts[t, m] = p
                conf[t, m] = confidence[1 + t][m]
                valid[t, m] = True

        # pad center count to a power of two as well (stable jit shapes)
        n_centers = len(center_points)
        C = 1 << (n_centers - 1).bit_length()
        centers_pad = np.zeros((C, 2), np.float32)
        centers_pad[:n_centers] = center_points
        center_valid = np.arange(C) < n_centers

        assignment, predicted_centers = assoc_ops.assign_to_centers(
            jnp.asarray(pts), jnp.asarray(valid), jnp.asarray(centers, dtype=jnp.float32),
            jnp.asarray(centers_pad), jnp.asarray(center_valid),
            reject_distance=self.reject_distance,
        )
        assignment = np.asarray(assignment)
        predicted_centers = np.asarray(predicted_centers)

        objects = []
        for j, center in enumerate(center_points):
            obj = {
                "center": center,
                "heatmap_points": [[] for _ in range(T)],
                "confidence": [[] for _ in range(T)],
                "p_centers": [],
            }
            objects.append(obj)

        for t in range(T):
            for m in range(M):
                if not valid[t, m]:
                    continue
                j = assignment[t, m]
                if j < 0:
                    continue
                objects[j]["p_centers"].append(predicted_centers[t, m])
                objects[j]["heatmap_points"][t].append(pts[t, m])
                objects[j]["confidence"][t].append(conf[t, m])

        for obj in objects:
            for t in range(T):
                if len(obj["heatmap_points"][t]) > 0:
                    points = np.stack(obj["heatmap_points"][t])
                    confidences = np.stack(obj["confidence"][t])
                    cap = self.keypoint_config[t]
                    if points.shape[0] > cap:
                        if cap == 1:
                            points = points[confidences.argmax(axis=0)][None]
                        else:
                            n = len(points)
                            m = 1 << (n - 1).bit_length()
                            pts_pad = np.zeros((m, 2), np.float32)
                            pts_pad[:n] = points
                            conf_pad = np.zeros((m,), np.float32)
                            conf_pad[:n] = confidences
                            centers_out = assoc_ops.masked_kmeans(
                                jnp.asarray(pts_pad), jnp.asarray(np.arange(m) < n),
                                jnp.asarray(conf_pad), cap,
                            )
                            points = np.asarray(centers_out)
                    obj["heatmap_points"][t] = points
                else:
                    obj["heatmap_points"][t] = np.array([])
        return objects


class DetectionToPoint:
    """2D detection + depth map -> camera-frame 3D point.

    Reference pipeline.py:155-171 (undistort, sample depth at the rounded
    undistorted pixel, unproject)."""

    def reset(self, camera):
        self.camera = camera
        self.min_index = np.zeros(2, np.int32)
        self.max_index = camera.image_size[::-1].astype(np.int32) - 1

    def __call__(self, xy, p_depth):
        if xy.shape[0] == 0:
            return None
        xy = self.camera.undistort(np.asarray(xy, np.float64))
        xy_int = np.clip(np.round(xy).astype(np.int32), self.min_index, self.max_index)
        zs = np.asarray(p_depth)[xy_int[:, 1], xy_int[:, 0]]
        return self.camera.unproject(xy, zs)


class TriangulationComponent:
    """Stereo 2D pair -> 3D (left-camera frame). Restores the component the
    reference's tests import (test/test_pipeline.py:174-206); math =
    StereoCamera.triangulate (camera_utils.py:92-110)."""

    name = "triangulation"

    def reset(self, stereo_camera):
        self.stereo_camera = stereo_camera

    def __call__(self, left_points, right_points):
        return self.stereo_camera.triangulate(
            np.asarray(left_points, np.float64), np.asarray(right_points, np.float64)
        )


class AssociationComponent:
    """Greedy mutually-exclusive epipolar matching of left/right detections.

    Restores the component documented by the reference's stale tests
    (test/test_pipeline.py:208-261): returns, per left point, the index of
    its right match or -1. Matching distance = right-point distance to the
    left point's epipolar line, greedy globally-nearest-first, one right
    point per left point.
    """

    name = "association"

    def __init__(self, threshold: float = 2.0):
        self.threshold = threshold
        self.stereo_camera = None

    def reset(self, stereo_camera):
        self.stereo_camera = stereo_camera
        self.F = jnp.asarray(stereo_camera.F, jnp.float32)

    def __call__(self, left_points, right_points):
        left = jnp.asarray(np.asarray(left_points, np.float32))
        right = jnp.asarray(np.asarray(right_points, np.float32))
        d = stereo_ops.epipolar_distances(self.F, left, right)
        assignment = assoc_ops.greedy_epipolar_match(
            d,
            jnp.ones(len(left_points), bool),
            jnp.ones(len(right_points), bool),
            threshold=self.threshold,
            max_matches=min(len(left_points), len(right_points)),
        )
        return np.asarray(assignment)


class ObjectKeypointPipeline:
    """End-to-end monocular decode: heatmaps -> objects with 3D keypoints.

    Reference pipeline.py:173-200. ``points_3d`` is accepted-and-unused
    exactly like the reference. Call with (1, K, H, W) maps.
    """

    def __init__(self, prediction_size, points_3d, keypoint_config,
                 max_peaks: int = 32):
        self.keypoint_extraction = KeypointExtractionComponent(
            keypoint_config, prediction_size, max_peaks=max_peaks
        )
        self.object_extraction = ObjectExtraction(keypoint_config, prediction_size)
        self.detection_to_point = DetectionToPoint()
        self.prediction_size = tuple(prediction_size)
        self.keypoint_config = tuple(keypoint_config["keypoint_config"])
        self.max_peaks = max_peaks
        self._camera = None

    def reset(self, camera):
        self._camera = camera
        self.detection_to_point.reset(camera)

    def __call__(self, heatmap, p_depth, p_centers):
        heatmap = _as_numpy(heatmap)
        assert heatmap.shape[0] == 1, "One at the time, please."
        p_centers = _as_numpy(p_centers)[0]
        p_depth = _as_numpy(p_depth)[0]
        points, confidence = self.keypoint_extraction(heatmap)
        detected_objects = self.object_extraction(points[0], confidence[0], p_centers)
        objects = []
        for obj in detected_objects:
            world_points = [self.detection_to_point(obj["center"][None], p_depth[0])]
            for i in range(len(obj["heatmap_points"])):
                point = self.detection_to_point(obj["heatmap_points"][i], p_depth[1 + i])
                world_points.append(point)
            objects.append(
                {
                    "p_centers": obj["p_centers"],
                    "keypoints": [obj["center"][None]] + obj["heatmap_points"],
                    "p_C": world_points,
                }
            )
        return objects

    def decode_device(self, probs, depth, offsets):
        """Single-program decode (no host raggedness) — the fast path used
        by bench.py; returns pipeline.decode_jit.DecodedObjects."""
        cam = self._camera
        camera = CameraArrays(
            K=jnp.asarray(cam.K, jnp.float32),
            D=jnp.asarray(cam.D, jnp.float32),
            Kinv=jnp.asarray(cam.Kinv, jnp.float32),
            image_size=jnp.asarray(cam.image_size, jnp.float32),
        )
        return decode_objects(
            jnp.asarray(probs), jnp.asarray(depth), jnp.asarray(offsets),
            camera, self.keypoint_config, model=cam.distortion_model,
            max_peaks=self.max_peaks,
        )


class LearnedKeypointTrackingPipeline(ObjectKeypointPipeline):
    """ObjectKeypointPipeline + model inference. Reference pipeline.py:202-209."""

    def __init__(self, model, cuda: bool = True, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.inference = InferenceComponent(model, cuda)

    def __call__(self, frame):
        heatmap, depth, centers = self.inference(frame)
        return super().__call__(heatmap, depth, centers), heatmap
