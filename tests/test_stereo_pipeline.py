"""Jitted stereo pipeline test: analytic heatmaps in both views -> matched,
triangulated 3D keypoints within the 5 cm fixture gate."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from object_keypoints_tpu.data import targets as T
from object_keypoints_tpu.geometry import (
    FisheyeCamera,
    StereoCamera,
    linalg,
    load_calibration_params,
)
from object_keypoints_tpu.pipeline.stereo_jit import (
    StereoKeypointPipeline,
    StereoRigArrays,
    stereo_decode_triangulate,
)

KEYPOINTS = np.array([
    [0.0, 0.0, 1.0],
    [0.25, 0.15, 1.0],
    [-0.25, -0.25, 1.0],
    [0.25, -0.25, 1.0],
])
CONFIG = {"keypoint_config": [1, 3]}


@pytest.fixture(scope="module")
def rig(calibration_file):
    params = load_calibration_params(calibration_file)
    scale = 180.0 / 720.0  # the reference fixture resolution (320 x 180)
    left = FisheyeCamera(params["K"], params["D"], params["image_size"]).scale(scale)
    right = FisheyeCamera(params["Kp"], params["Dp"], params["image_size"]).scale(scale)
    return StereoCamera(left, right, params["T_RL"])


def _heatmaps(rig, keypoints):
    """Render per-type gaussian maps in both views at 180x320 (the
    reference fixture scale) using the device splat, so peaks sit exactly
    at the projections."""
    with_center = np.zeros((keypoints.shape[0] + 1, 3))
    with_center[0] = keypoints.mean(axis=0)
    with_center[1:] = keypoints
    p_l = rig.left_camera.project(with_center)
    p_r = rig.right_camera.project(
        np.asarray(linalg.transform_points(rig.T_RL, with_center))
    )
    maps = (1, 1, 3)
    heats = []
    for pts in (p_l, p_r):
        heats.append(
            np.asarray(
                T.render_heatmaps(
                    jnp.asarray(pts[None], jnp.float32),
                    jnp.ones((1, len(pts)), bool), maps, (180, 320),
                )
            )
        )
    return heats[0], heats[1], p_l, p_r, with_center


class TestStereoJit:
    def test_matched_triangulation_within_gate(self, rig):
        heat_l, heat_r, p_l, p_r, points = _heatmaps(rig, KEYPOINTS)
        out = stereo_decode_triangulate(
            jnp.asarray(heat_l), jnp.asarray(heat_r),
            StereoRigArrays.from_stereo_camera(rig),
            max_peaks=8, epipolar_threshold=3.0,
        )
        valid = np.asarray(out.match_valid)
        p3 = np.asarray(out.points_3d)
        assert valid[0].sum() == 1  # center map
        assert valid[1].sum() == 1
        assert valid[2].sum() == 3
        # every matched 3D point within 5 cm of an analytic keypoint
        for c in range(3):
            for p in p3[c][valid[c]]:
                d = np.linalg.norm(points - p, axis=1).min()
                assert d < 5e-2, (c, p, d)

    def test_host_facade(self, rig):
        heat_l, heat_r, *_ = _heatmaps(rig, KEYPOINTS)
        pipeline = StereoKeypointPipeline(CONFIG, max_peaks=8, epipolar_threshold=3.0)
        pipeline.reset(rig)
        objects = pipeline(heat_l, heat_r)
        assert len(objects) == 3
        assert objects[2]["p_L"].shape == (3, 3)
        assert objects[0]["points_left"].shape == (1, 2)
