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

    def test_jit_matches_host_chain_within_5mm(self, rig):
        """The jitted stereo geometry (grid+Newton Hartley-Sturm, fixed-
        iteration undistort) must agree with the host component chain
        (AssociationComponent + TriangulationComponent over cv2) to <=5 mm
        on the same detections — the BASELINE.md 3D parity budget."""
        from object_keypoints_tpu.pipeline.components import (
            AssociationComponent,
            KeypointExtractionComponent,
            TriangulationComponent,
        )

        heat_l, heat_r, *_ = _heatmaps(rig, KEYPOINTS)
        out = stereo_decode_triangulate(
            jnp.asarray(heat_l), jnp.asarray(heat_r),
            StereoRigArrays.from_stereo_camera(rig),
            max_peaks=8, epipolar_threshold=3.0,
        )
        jit_valid = np.asarray(out.match_valid)
        jit_left = np.asarray(out.points_left)
        jit_p3 = np.asarray(out.points_3d)

        extraction = KeypointExtractionComponent(CONFIG, (180, 320), max_peaks=8)
        (kp_l, _), (kp_r, _) = extraction(heat_l[None], heat_r[None])
        assoc = AssociationComponent(threshold=3.0)
        assoc.reset(rig)
        tri = TriangulationComponent()
        tri.reset(rig)

        n_checked = 0
        for c in range(3):
            L, R = kp_l[0][c], kp_r[0][c]
            if not L or not R:
                continue
            a = assoc(np.stack(L), np.stack(R))
            for i, j in enumerate(a):
                if j < 0:
                    continue
                p3d_host = tri(np.asarray(L[i])[None], np.asarray(R[j])[None])[0]
                d_slots = np.linalg.norm(jit_left[c] - np.asarray(L[i]), axis=1)
                k = int(d_slots.argmin())
                if d_slots[k] < 0.5 and jit_valid[c, k]:
                    dev = float(np.linalg.norm(jit_p3[c, k] - p3d_host))
                    assert dev < 5e-3, (c, k, dev)
                    n_checked += 1
        assert n_checked >= 4, f"only {n_checked} matched points compared"

    def test_host_facade(self, rig):
        heat_l, heat_r, *_ = _heatmaps(rig, KEYPOINTS)
        pipeline = StereoKeypointPipeline(CONFIG, max_peaks=8, epipolar_threshold=3.0)
        pipeline.reset(rig)
        objects = pipeline(heat_l, heat_r)
        assert len(objects) == 3
        assert objects[2]["p_L"].shape == (3, 3)
        assert objects[0]["points_left"].shape == (1, 2)
