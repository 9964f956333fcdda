"""Fully-jitted stereo pipeline: two heatmap stacks -> matched 3D keypoints.

The reference's original architecture (documented by its stale tests,
test/test_pipeline.py:171-261, and named by BASELINE.json's north star)
extracts keypoints in BOTH stereo views, associates them along epipolar
lines, and triangulates — rather than reading a depth head. This module is
that path as ONE fixed-shape XLA program:

    probs_l/probs_r (K, H, W)
      -> per-channel peak extraction (ops.decode)
      -> per-channel greedy epipolar matching (ops.associate) on
         undistorted coordinates
      -> batched undistort -> Hartley-Sturm correction -> DLT
         (geometry.stereo), masked over unmatched slots.

Returns per-channel matched left/right points and triangulated 3D points
in the left-camera frame, with validity masks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from object_keypoints_tpu.geometry import cameras as cam_ops
from object_keypoints_tpu.geometry import stereo as stereo_ops
from object_keypoints_tpu.ops import associate as assoc_ops
from object_keypoints_tpu.ops import decode as decode_ops


class StereoRigArrays(NamedTuple):
    """Jit-able stereo rig parameters (equidistant fisheye both sides)."""

    K: jax.Array
    D: jax.Array
    Kp: jax.Array
    Dp: jax.Array
    T_RL: jax.Array
    F: jax.Array

    @classmethod
    def from_stereo_camera(cls, rig, dtype=jnp.float32):
        return cls(
            K=jnp.asarray(rig.left_camera.K, dtype),
            D=jnp.asarray(rig.left_camera.D, dtype),
            Kp=jnp.asarray(rig.right_camera.K, dtype),
            Dp=jnp.asarray(rig.right_camera.D, dtype),
            T_RL=jnp.asarray(rig.T_RL, dtype),
            F=jnp.asarray(rig.F, dtype),
        )


class StereoDecoded(NamedTuple):
    points_left: jax.Array  # (K, M, 2) sub-pixel (x, y)
    points_right: jax.Array  # (K, M, 2) matched right points (per left slot)
    match_valid: jax.Array  # (K, M)
    points_3d: jax.Array  # (K, M, 3) left-camera frame
    left_valid: jax.Array  # (K, M) raw left detections
    confidence: jax.Array  # (K, M) left detection confidence


@functools.partial(
    jax.jit, static_argnames=("max_peaks", "peak_threshold", "epipolar_threshold")
)
def stereo_decode_triangulate(
    probs_l,
    probs_r,
    rig: StereoRigArrays,
    max_peaks: int = 16,
    peak_threshold: float = 0.5,
    epipolar_threshold: float = 2.0,
) -> StereoDecoded:
    """probs_l/probs_r: (K, H, W) per-type probability maps (one stereo
    pair). vmap over a leading batch axis for batched pairs."""
    pts_l, conf_l, valid_l = decode_ops.extract_peaks(
        probs_l, max_peaks=max_peaks, threshold=peak_threshold
    )
    pts_r, conf_r, valid_r = decode_ops.extract_peaks(
        probs_r, max_peaks=max_peaks, threshold=peak_threshold
    )

    und_l = cam_ops.fisheye_undistort_points(pts_l, rig.K, rig.D, P=rig.K)
    und_r = cam_ops.fisheye_undistort_points(pts_r, rig.Kp, rig.Dp, P=rig.Kp)

    def match_channel(ul, ur, vl, vr):
        d = stereo_ops.epipolar_distances(rig.F, ul, ur)
        assignment = assoc_ops.greedy_epipolar_match(
            d, vl, vr, threshold=epipolar_threshold, max_matches=ul.shape[0]
        )
        matched = assignment >= 0
        idx = jnp.clip(assignment, 0, ur.shape[0] - 1)
        return idx, matched

    idx, matched = jax.vmap(match_channel)(und_l, und_r, valid_l, valid_r)
    # gather matched right pixel coords per left slot
    pts_r_matched = jnp.take_along_axis(pts_r, idx[..., None], axis=1)
    match_valid = matched & valid_l

    k, m, _ = pts_l.shape
    p3d = stereo_ops.triangulate_pixels(
        pts_l.reshape(-1, 2), pts_r_matched.reshape(-1, 2),
        rig.K, rig.D, rig.Kp, rig.Dp, rig.T_RL, rig.F,
    ).reshape(k, m, 3)
    p3d = jnp.where(match_valid[..., None], p3d, 0.0)

    return StereoDecoded(
        points_left=pts_l,
        points_right=pts_r_matched,
        match_valid=match_valid,
        points_3d=p3d,
        left_valid=valid_l,
        confidence=conf_l,
    )


class StereoKeypointPipeline:
    """Host facade: heatmap pairs in, ragged matched-3D out (the restored
    stereo architecture as a convenience API over the jitted core)."""

    def __init__(self, keypoint_config, max_peaks: int = 16,
                 peak_threshold: float = 0.5, epipolar_threshold: float = 2.0):
        self.keypoint_config = [1] + list(keypoint_config["keypoint_config"])
        self.max_peaks = max_peaks
        self.peak_threshold = peak_threshold
        self.epipolar_threshold = epipolar_threshold
        self.rig = None

    def reset(self, stereo_camera):
        self.rig = StereoRigArrays.from_stereo_camera(stereo_camera)

    def __call__(self, heatmaps_left, heatmaps_right):
        import numpy as np

        out = stereo_decode_triangulate(
            jnp.asarray(heatmaps_left, jnp.float32),
            jnp.asarray(heatmaps_right, jnp.float32),
            self.rig,
            max_peaks=self.max_peaks,
            peak_threshold=self.peak_threshold,
            epipolar_threshold=self.epipolar_threshold,
        )
        valid = np.asarray(out.match_valid)
        p3 = np.asarray(out.points_3d)
        pl = np.asarray(out.points_left)
        pr = np.asarray(out.points_right)
        return [
            {
                "points_left": pl[c][valid[c]],
                "points_right": pr[c][valid[c]],
                "p_L": p3[c][valid[c]],
            }
            for c in range(len(self.keypoint_config))
        ]
