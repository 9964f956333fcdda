"""Fully-jitted object decoding: heatmaps -> associated 3D keypoints.

This is the device half of the inference pipeline: everything the reference
does with per-peak Python loops, sklearn KMeans and host OpenCV calls
(perception/pipeline.py:30-200) compiled into ONE fixed-shape XLA program:

    probs (K,H,W), depth (K,H,W), offsets (T,2,H,W)
      -> peak extraction (ops.decode)
      -> center association (ops.associate.assign_to_centers)
      -> per-(object,type) capacity resolution (argmax / masked k-means)
      -> undistort + depth-lookup unprojection into the camera frame.

Static capacities: MAX_PEAKS detections per heatmap channel; every center
peak founds an object (like the reference, pipeline.py:108-115). The host
wrapper (pipeline.components) converts the masked arrays back into the
reference's ragged list-of-dicts.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_keypoints_tpu.geometry import cameras as cam_ops
from object_keypoints_tpu.ops import decode as decode_ops
from object_keypoints_tpu.ops import associate as assoc_ops


class CameraArrays(NamedTuple):
    """Jit-able camera parameters (model handled as a static string)."""

    K: jax.Array
    D: jax.Array
    Kinv: jax.Array
    image_size: jax.Array  # (height, width)


class DecodedObjects(NamedTuple):
    """Fixed-shape decode result. M = max peaks, T = keypoint types,
    C = max capacity over types."""

    center_points: jax.Array  # (M, 2) sub-pixel (x, y)
    center_valid: jax.Array  # (M,)
    center_p3d: jax.Array  # (M, 3) camera frame
    keypoints: jax.Array  # (M, T, C, 2)
    keypoints_valid: jax.Array  # (M, T, C)
    keypoints_p3d: jax.Array  # (M, T, C, 3)
    predicted_centers: jax.Array  # (T, M, 2) center votes of raw detections
    assignment: jax.Array  # (T, M) raw-detection -> object index or -1
    raw_points: jax.Array  # (T, M, 2) raw per-type detections
    raw_valid: jax.Array  # (T, M)


def _lift(points, valid, depth_plane, camera: CameraArrays, model: str):
    """Undistort, read depth at the rounded undistorted pixel, unproject.

    Mirrors DetectionToPoint (reference pipeline.py:155-171): note the depth
    is sampled at the *undistorted* rounded location.
    """
    if model == "equidistant":
        und = cam_ops.fisheye_undistort_points(points, camera.K, camera.D, P=camera.K)
    else:
        und = cam_ops.radtan_undistort_points(points, camera.K, camera.D, P=camera.K)
    h = camera.image_size[0].astype(jnp.int32)
    w = camera.image_size[1].astype(jnp.int32)
    xy_int = jnp.round(und).astype(jnp.int32)
    xy_int = jnp.clip(xy_int, jnp.zeros(2, jnp.int32), jnp.stack([w - 1, h - 1]))
    z = depth_plane[xy_int[..., 1], xy_int[..., 0]]
    p3d = cam_ops.unproject(und, z, camera.Kinv)
    return jnp.where(valid[..., None], p3d, 0.0)


def _decode_objects_impl(
    probs,
    depth,
    offsets,
    camera: CameraArrays,
    keypoint_config: tuple,
    model: str = "equidistant",
    max_peaks: int = 32,
    reject_distance: float = 20.0,
    peak_threshold: float = 0.5,
) -> DecodedObjects:
    """Decode one frame. probs: (1+T, H, W) probabilities with channel 0 the
    object-center map (config prepend, reference pipeline.py:36); depth:
    (1+T, H, W); offsets: (T, 2, H, W). keypoint_config: per-type
    capacities, e.g. (1, 3) for the valve."""
    T = len(keypoint_config)
    assert probs.shape[0] == T + 1

    points, conf, valid = decode_ops.extract_peaks(
        probs, max_peaks=max_peaks, threshold=peak_threshold
    )
    center_points, center_conf, center_valid = points[0], conf[0], valid[0]
    type_points, type_conf, type_valid = points[1:], conf[1:], valid[1:]

    assignment, predicted_centers = assoc_ops.assign_to_centers(
        type_points, type_valid, offsets, center_points, center_valid,
        reject_distance=reject_distance,
    )

    max_cap = max(keypoint_config)
    m = max_peaks

    per_type_points = []
    per_type_valid = []
    for t, capacity in enumerate(keypoint_config):
        def resolve_one(obj_idx, t=t, capacity=capacity):
            mask = (assignment[t] == obj_idx) & type_valid[t]
            out, out_valid = assoc_ops.resolve_capacity(
                type_points[t], mask, type_conf[t], capacity
            )
            pad = max_cap - capacity
            if pad:
                out = jnp.pad(out, ((0, pad), (0, 0)))
                out_valid = jnp.pad(out_valid, (0, pad))
            return out, out_valid

        out, out_valid = jax.vmap(resolve_one)(jnp.arange(m))
        per_type_points.append(out)
        per_type_valid.append(out_valid)

    keypoints = jnp.stack(per_type_points, axis=1)  # (M, T, C, 2)
    keypoints_valid = jnp.stack(per_type_valid, axis=1) & center_valid[:, None, None]

    center_p3d = _lift(center_points, center_valid, depth[0], camera, model)
    kp_p3d = []
    for t in range(T):
        kp_p3d.append(
            _lift(keypoints[:, t], keypoints_valid[:, t], depth[1 + t], camera, model)
        )
    keypoints_p3d = jnp.stack(kp_p3d, axis=1)

    return DecodedObjects(
        center_points=center_points,
        center_valid=center_valid,
        center_p3d=center_p3d,
        keypoints=keypoints,
        keypoints_valid=keypoints_valid,
        keypoints_p3d=keypoints_p3d,
        predicted_centers=predicted_centers,
        assignment=assignment,
        raw_points=type_points,
        raw_valid=type_valid,
    )


_STATIC_DECODE_ARGS = (
    "keypoint_config",
    "model",
    "max_peaks",
    "reject_distance",
    "peak_threshold",
)


@functools.partial(jax.jit, static_argnames=_STATIC_DECODE_ARGS)
def decode_objects(probs, depth, offsets, camera, keypoint_config, model="equidistant",
                   max_peaks=32, reject_distance=20.0, peak_threshold=0.5):
    return _decode_objects_impl(
        probs, depth, offsets, camera, keypoint_config, model, max_peaks,
        reject_distance, peak_threshold,
    )


@functools.partial(jax.jit, static_argnames=_STATIC_DECODE_ARGS)
def decode_objects_batch(probs, depth, offsets, camera, keypoint_config,
                         model="equidistant", max_peaks=32, reject_distance=20.0,
                         peak_threshold=0.5):
    """Batched decode: probs/depth (N, K, H, W), offsets (N, T, 2, H, W)."""
    return jax.vmap(
        lambda p, d, o: _decode_objects_impl(
            p, d, o, camera, keypoint_config, model, max_peaks,
            reject_distance, peak_threshold,
        )
    )(probs, depth, offsets)
