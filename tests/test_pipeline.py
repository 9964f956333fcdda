"""Pipeline parity tests — port of the reference test/test_pipeline.py
semantics (SURVEY.md §4): analytic keypoints + the real stereo calibration
render ideal heatmaps through the fisheye cameras; extraction must recover
peaks to <1 px, association must group objects correctly, and the stereo
triangulation path must recover metric 3D to the reference gates. The
learned network is never involved.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from object_keypoints_tpu.geometry import (
    FisheyeCamera,
    StereoCamera,
    linalg,
    load_calibration_params,
)
from object_keypoints_tpu.data import targets as T
from object_keypoints_tpu.pipeline import (
    AssociationComponent,
    KeypointExtractionComponent,
    ObjectExtraction,
    ObjectKeypointPipeline,
    TriangulationComponent,
)

FULL_H, FULL_W = 720, 1280
SMALL_H, SMALL_W = 180, 320
SCALE = SMALL_H / FULL_H

KEYPOINTS_DISTINCT = np.array([
    [0.0, 0.0, 1.1],
    [0.1, 0.0, 1.0],
    [-0.1, 0.0, 1.0],
])
KEYPOINTS_TWO_KINDS = np.array([
    [0.0, 0.0, 1.0],
    [0.25, 0.15, 1.0],
    [-0.25, -0.25, 1.0],
    [0.25, -0.25, 1.0],
])
CONFIG_DISTINCT = {"keypoint_config": [1, 1, 1]}
CONFIG_TWO_KINDS = {"keypoint_config": [1, 3]}


def _with_center(points):
    out = np.zeros((points.shape[0] + 1, 3))
    out[0] = points.mean(axis=0)
    out[1:] = points
    return out


@pytest.fixture(scope="module")
def rig(calibration_file):
    params = load_calibration_params(calibration_file)
    left = FisheyeCamera(params["K"], params["D"], params["image_size"])
    right = FisheyeCamera(params["Kp"], params["Dp"], params["image_size"])
    return StereoCamera(left, right, params["T_RL"])


def _render_full_heatmaps(keypoints, config, T_LW, T_RW, left_cam, right_cam):
    """Discrete-kernel splats at full resolution, like the reference's
    compute_heatmaps fixture (test_pipeline.py:39-57)."""
    maps = [1] + config["keypoint_config"]
    kernel = T.compute_kernel(50, 25, 10.0)
    heat_l = np.zeros((len(maps), FULL_H, FULL_W), np.float32)
    heat_r = np.zeros_like(heat_l)
    p_L = left_cam.project(keypoints, T_LW)
    p_R = right_cam.project(keypoints, T_RW)
    per_object = sum(maps)
    n_objects = keypoints.shape[0] // per_object
    cursor = 0
    for _ in range(n_objects):
        for m, count in enumerate(maps):
            for _ in range(count):
                T.add_discrete_kernel(heat_l[m], kernel, p_L[cursor][None])
                T.add_discrete_kernel(heat_r[m], kernel, p_R[cursor][None])
                cursor += 1
    heat_l /= heat_l.max()
    heat_r /= heat_r.max()
    return heat_l, heat_r, p_L, p_R


def _resize_stack(stack, normalize=False):
    out = np.zeros((stack.shape[0], SMALL_H, SMALL_W), np.float32)
    for i in range(stack.shape[0]):
        out[i] = cv2.resize(stack[i], (SMALL_W, SMALL_H))
        if normalize:
            out[i] /= max(out[i].max(), 1e-9)
    return out


class TestKeypointExtraction:
    def test_extract_single_points(self, rig):
        T_LW = np.eye(4)
        T_RW = rig.T_RL @ T_LW
        heat_l, heat_r, p_L, p_R = _render_full_heatmaps(
            _with_center(KEYPOINTS_DISTINCT), CONFIG_DISTINCT, T_LW, T_RW,
            rig.left_camera, rig.right_camera,
        )
        pred_l = _resize_stack(heat_l)
        pred_r = _resize_stack(heat_r)
        comp = KeypointExtractionComponent(CONFIG_DISTINCT, [SMALL_H, SMALL_W])
        (left_points, _), (right_points, _) = comp(pred_l[None], pred_r[None])
        for i in range(4):  # center + 3 distinct keypoints, one per channel
            p_L_hat = left_points[0][i][0]
            p_R_hat = right_points[0][i][0]
            assert np.linalg.norm(p_L_hat - p_L[i] * SCALE) < 1.0
            assert np.linalg.norm(p_R_hat - p_R[i] * SCALE) < 1.0

    def test_extract_multiple(self, rig):
        T_LW = np.eye(4)
        T_RW = rig.T_RL @ T_LW
        heat_l, heat_r, p_L, p_R = _render_full_heatmaps(
            _with_center(KEYPOINTS_TWO_KINDS), CONFIG_TWO_KINDS, T_LW, T_RW,
            rig.left_camera, rig.right_camera,
        )
        pred_l = _resize_stack(heat_l, normalize=True)
        pred_r = _resize_stack(heat_r, normalize=True)
        comp = KeypointExtractionComponent(CONFIG_TWO_KINDS, [SMALL_H, SMALL_W])
        (left_points, _), (right_points, _) = comp(pred_l[None], pred_r[None])
        flat_l = [p for channel in left_points[0] for p in channel]
        flat_r = [p for channel in right_points[0] for p in channel]
        for i in range(len(_with_center(KEYPOINTS_TWO_KINDS))):
            dl = np.linalg.norm(p_L * SCALE - flat_l[i], axis=1).min() if i < len(flat_l) else 1e9
            dr = np.linalg.norm(p_R * SCALE - flat_r[i], axis=1).min() if i < len(flat_r) else 1e9
            assert dl < 1.0
            assert dr < 1.0

    def test_two_objects(self, rig):
        T_LW = np.eye(4)
        T_RW = rig.T_RL @ T_LW
        kp1 = _with_center(KEYPOINTS_DISTINCT)
        kp2 = _with_center(KEYPOINTS_DISTINCT + np.array([[-0.5, 0.0, 0.0]]))
        all_kp = np.concatenate([kp1, kp2], axis=0)
        heat_l, heat_r, p_L, p_R = _render_full_heatmaps(
            all_kp, CONFIG_DISTINCT, T_LW, T_RW, rig.left_camera, rig.right_camera
        )
        pred_l = _resize_stack(heat_l, normalize=True)
        pred_r = _resize_stack(heat_r, normalize=True)
        comp = KeypointExtractionComponent(CONFIG_DISTINCT, [SMALL_H, SMALL_W])
        (left_points, _), (right_points, _) = comp(pred_l[None], pred_r[None])
        # cv2.resize coordinate convention: x_small = (x_full + 0.5) * s - 0.5
        p_L = ((p_L + 0.5) * SCALE - 0.5).reshape(2, -1, 2)
        p_R = ((p_R + 0.5) * SCALE - 0.5).reshape(2, -1, 2)
        for i in range(4):
            lp = np.stack(left_points[0][i])
            rp = np.stack(right_points[0][i])
            for obj in range(2):
                assert np.linalg.norm(lp - p_L[obj, i], axis=1).min() < 0.5
                assert np.linalg.norm(rp - p_R[obj, i], axis=1).min() < 0.5


class TestTriangulation:
    def test_triangulation_exact(self, rig):
        keypoints = _with_center(KEYPOINTS_DISTINCT)
        p_L = rig.left_camera.project(keypoints)
        p_R = rig.right_camera.project(
            np.asarray(linalg.transform_points(rig.T_RL, keypoints))
        )
        tri = TriangulationComponent()
        tri.reset(rig)
        p_W = tri(p_L, p_R)
        assert np.linalg.norm(p_W - keypoints, axis=1).max() < 1e-3

    def test_extraction_plus_triangulation(self, rig):
        T_LW = np.eye(4)
        T_RW = rig.T_RL @ T_LW
        keypoints = _with_center(KEYPOINTS_TWO_KINDS)
        heat_l, heat_r, _, _ = _render_full_heatmaps(
            keypoints, CONFIG_TWO_KINDS, T_LW, T_RW, rig.left_camera, rig.right_camera
        )
        pred_l = _resize_stack(heat_l)
        pred_r = _resize_stack(heat_r)

        left_cam = rig.left_camera.scale(SCALE)
        right_cam = rig.right_camera.scale(SCALE)
        rig_small = StereoCamera(left_cam, right_cam, rig.T_RL)

        extraction = KeypointExtractionComponent(CONFIG_TWO_KINDS, [SMALL_H, SMALL_W])
        triangulation = TriangulationComponent()
        triangulation.reset(rig_small)
        (left, _), (right, _) = extraction(pred_l[None], pred_r[None])
        left, right = left[0], right[0]
        points = []
        for i in range(len(left)):
            lp, rp = np.stack(left[i]), np.stack(right[i])
            assert lp.shape[0] == rp.shape[0]
            assert lp.shape[0] in (1, 3)
            points.append(triangulation(lp, rp))
        assert points[0].shape == (1, 3)
        assert points[1].shape == (1, 3)
        assert points[2].shape == (3, 3)
        assert np.linalg.norm(points[0][0] - keypoints[0]) < 5e-2
        assert np.linalg.norm(points[1][0] - keypoints[1]) < 5e-2


class TestAssociation:
    KEYPOINTS_X = np.array([[0.0, 0.0, 1.0], [0.0, 0.25, 1.0], [0.0, -0.25, 1.0]])

    def _project_pair(self, rig, pts):
        T_LW = np.eye(4)
        T_RW = rig.T_RL @ T_LW
        p_l = rig.left_camera.project(pts, T_LW)
        p_r = rig.right_camera.project(pts, T_RW)
        return p_l, p_r

    def test_association_shuffled(self, rig):
        p_l, p_r = self._project_pair(rig, self.KEYPOINTS_X)
        assoc = AssociationComponent()
        assoc.reset(rig)
        rng = np.random.default_rng(0)
        for _ in range(5):
            perm = rng.permutation(3)
            shuffled = p_r[perm]
            a = assoc(p_l, shuffled)
            assert (a != -1).all()
            np.testing.assert_allclose(p_r, shuffled[a], atol=1e-6)

    def test_association_with_decoy(self, rig):
        """Left point 0 has no true match (its right detection is replaced
        by a decoy near another point's line) -> must return -1 for it,
        match the rest (reference test_association_two_same semantics)."""
        p_l, p_r = self._project_pair(rig, self.KEYPOINTS_X)
        decoy = p_r[1] + np.array([0.0, 25.0])  # off every epipolar line
        right = np.stack([decoy, p_r[1], p_r[2]])
        assoc = AssociationComponent()
        assoc.reset(rig)
        a = assoc(p_l, right)
        assert a[0] == -1
        assert a[1] == 1
        assert a[2] == 2

    def test_association_mutual_exclusion(self, rig):
        """Close-by points on nearly the same epipolar line must still get
        unique matches (reference test_association_tricky semantics)."""
        pts = np.array([
            [0.0, -0.02, 1.0],
            [0.0, 0.02, 1.0],
            [0.15, 0.0, 1.0],
        ])
        p_l, p_r = self._project_pair(rig, pts)
        assoc = AssociationComponent(threshold=15.0)
        assoc.reset(rig)
        a = assoc(p_l, p_r)
        assert a.shape[0] == 3
        assert np.unique(a).size == 3
        np.testing.assert_array_equal(a, [0, 1, 2])


class TestMonocularPipeline:
    def test_object_pipeline_on_ground_truth_maps(self, rig):
        """End-to-end monocular decode on analytic targets: the depth-head
        path (current reference pipeline, pipeline.py:173-200)."""
        config = CONFIG_TWO_KINDS
        keypoints = _with_center(KEYPOINTS_TWO_KINDS)
        # the reference camera chain into 64x64 prediction space
        # (scripts/eval_model.py:61-69): scale to 511 tall, center-cut to
        # 511x511, scale to 64.
        offset = np.array([(511.0 / FULL_H * FULL_W - 511.0) / 2.0, 0.0])
        cam64 = rig.left_camera.scale(511.0 / FULL_H).cut(offset).scale(64.0 / 511.0)
        projected = cam64.project(keypoints)

        maps = tuple([1] + config["keypoint_config"])
        pts = jnp.asarray(projected[None], jnp.float32)
        p_C = jnp.asarray(keypoints[None], jnp.float32)
        valid = jnp.ones((1, len(keypoints)), bool)
        heat, depth, centers = T.render_all_targets(pts, p_C, valid, maps, (64, 64))

        pipeline = ObjectKeypointPipeline([64, 64], None, config)
        pipeline.reset(cam64)
        objects = pipeline(np.asarray(heat)[None], np.asarray(depth)[None],
                           np.asarray(centers)[None])
        assert len(objects) == 1
        obj = objects[0]
        # center 3D within 5 cm of the analytic center
        assert np.linalg.norm(obj["p_C"][0][0] - keypoints[0]) < 5e-2
        # type-1 keypoint
        assert np.linalg.norm(obj["p_C"][1][0] - keypoints[1]) < 5e-2
        # type-2: 3 keypoints, each near one of the last three
        got = obj["p_C"][2]
        assert got.shape[0] == 3
        for p in got:
            assert np.linalg.norm(keypoints[2:] - p, axis=1).min() < 5e-2

    def test_object_extraction_rejects_outliers(self):
        config = {"keypoint_config": [1]}
        extraction = ObjectExtraction(config, (64, 64))
        keypoints = [
            [np.array([32.0, 32.0])],  # one center
            [np.array([33.0, 33.0]), np.array([5.0, 5.0])],  # near + far point
        ]
        confidence = [[1.0], [1.0, 1.0]]
        offsets = np.zeros((1, 2, 64, 64), np.float32)  # predicted center = own pixel
        objects = extraction(keypoints, confidence, offsets)
        assert len(objects) == 1
        # the far point's predicted center (5,5) is >20 px from (32,32): rejected
        assert objects[0]["heatmap_points"][0].shape == (1, 2)
        np.testing.assert_allclose(objects[0]["heatmap_points"][0][0], [33.0, 33.0])

    def test_capacity_argmax(self):
        config = {"keypoint_config": [1]}
        extraction = ObjectExtraction(config, (64, 64))
        keypoints = [
            [np.array([32.0, 32.0])],
            [np.array([30.0, 30.0]), np.array([34.0, 34.0])],
        ]
        confidence = [[1.0], [0.4, 0.9]]
        offsets = np.zeros((1, 2, 64, 64), np.float32)
        objects = extraction(keypoints, confidence, offsets)
        pts = objects[0]["heatmap_points"][0]
        assert pts.shape == (1, 2)
        np.testing.assert_allclose(pts[0], [34.0, 34.0])  # higher confidence wins
