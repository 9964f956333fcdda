"""Numerical-parity tests for the geometry core against OpenCV.

This is the rebuild's highest-risk layer (SURVEY.md §7 step 1): the
reference does all camera math through cv2 on the host; ours must match it
inside jit to well below the 1px / 5mm north-star gates.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from object_keypoints_tpu.geometry import (
    FisheyeCamera,
    RadTanPinholeCamera,
    StereoCamera,
    fundamental_matrix,
    linalg,
    load_calibration_params,
)
from object_keypoints_tpu.geometry import stereo as stereo_ops


@pytest.fixture(scope="module")
def params(calibration_file):
    return load_calibration_params(calibration_file)


@pytest.fixture(scope="module")
def stereo(params):
    left = FisheyeCamera(params["K"], params["D"], params["image_size"])
    right = FisheyeCamera(params["Kp"], params["Dp"], params["image_size"])
    return StereoCamera(left, right, params["T_RL"])


def _random_points(n=64, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-0.4, -0.3, 0.7], [0.4, 0.3, 2.0], size=(n, 3))
    return pts


class TestLinalg:
    def test_inv_transform(self):
        rng = np.random.default_rng(1)
        for _ in range(5):
            aa = rng.normal(size=3)
            angle = np.linalg.norm(aa)
            R, _ = cv2.Rodrigues(aa)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = rng.normal(size=3)
            Tinv = np.asarray(linalg.inv_transform(T))
            np.testing.assert_allclose(Tinv @ T, np.eye(4), atol=1e-6)
            assert angle > 0  # sanity

    def test_skew(self):
        v = np.array([1.0, -2.0, 3.0])
        S = np.asarray(linalg.skew_matrix(v))
        w = np.array([0.3, 0.1, -0.7])
        np.testing.assert_allclose(S @ w, np.cross(v, w), atol=1e-6)

    def test_transform_points(self):
        T = np.eye(4)
        T[:3, 3] = [1.0, 2.0, 3.0]
        pts = _random_points(8)
        out = np.asarray(linalg.transform_points(T, pts))
        np.testing.assert_allclose(out, pts + T[:3, 3], atol=1e-6)

    def test_euler_matches_scipy(self):
        from scipy.spatial.transform import Rotation

        rng = np.random.default_rng(3)
        for _ in range(10):
            R1 = Rotation.random(random_state=rng.integers(1 << 31)).as_matrix()
            R2 = Rotation.random(random_state=rng.integers(1 << 31)).as_matrix()
            ours = np.asarray(linalg.angle_between(R1, R2))
            ref = Rotation.from_matrix(R1.T @ R2).as_euler("xyz", degrees=False)
            np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestFisheye:
    def test_project_matches_cv2(self, params):
        cam = FisheyeCamera(params["K"], params["D"], params["image_size"])
        pts = _random_points()
        ours = cam.project(pts)
        ref, _ = cv2.fisheye.projectPoints(
            pts[:, None, :], np.zeros(3), np.zeros(3), params["K"], params["D"]
        )
        np.testing.assert_allclose(ours, ref[:, 0], atol=2e-3)

    def test_project_with_transform(self, params):
        cam = FisheyeCamera(params["K"], params["D"], params["image_size"])
        rng = np.random.default_rng(7)
        rvec = rng.normal(size=3) * 0.2
        tvec = np.array([0.05, -0.02, 0.1])
        R, _ = cv2.Rodrigues(rvec)
        T_CW = np.eye(4)
        T_CW[:3, :3] = R
        T_CW[:3, 3] = tvec
        pts = _random_points(32, seed=5)
        ours = cam.project(pts, T_CW)
        ref, _ = cv2.fisheye.projectPoints(pts[:, None, :], rvec, tvec, params["K"], params["D"])
        np.testing.assert_allclose(ours, ref[:, 0], atol=2e-3)

    def test_undistort_matches_cv2(self, params):
        cam = FisheyeCamera(params["K"], params["D"], params["image_size"])
        pts = _random_points(48, seed=2)
        pixels = cam.project(pts)
        ours = cam.undistort(pixels)
        ref = cv2.fisheye.undistortPoints(
            pixels[:, None, :].astype(np.float64), params["K"], params["D"], P=params["K"]
        )[:, 0]
        np.testing.assert_allclose(ours, ref, atol=5e-3)

    def test_project_undistort_unproject_roundtrip(self, params):
        cam = FisheyeCamera(params["K"], params["D"], params["image_size"])
        pts = _random_points(32, seed=9)
        pixels = cam.project(pts)
        und = cam.undistort(pixels)
        recon = cam.unproject(und, pts[:, 2])
        np.testing.assert_allclose(recon, pts, atol=1e-3)


class TestRadTan:
    K = np.array([[700.0, 0.0, 640.0], [0.0, 700.0, 360.0], [0.0, 0.0, 1.0]])
    D = np.array([-0.15, 0.02, -3e-4, 2e-4])

    def test_project_matches_cv2(self):
        cam = RadTanPinholeCamera(self.K, self.D, [720, 1280])
        pts = _random_points(32, seed=3)
        ours = cam.project(pts)
        ref, _ = cv2.projectPoints(pts[:, None, :], np.zeros(3), np.zeros(3), self.K, self.D)
        np.testing.assert_allclose(ours, ref[:, 0], atol=2e-3)

    def test_undistort_matches_cv2(self):
        cam = RadTanPinholeCamera(self.K, self.D, [720, 1280])
        pts = _random_points(32, seed=4)
        pixels = cam.project(pts)
        ours = cam.undistort(pixels)
        ref = cv2.undistortPoints(pixels[:, None, :], self.K, self.D, P=self.K)[:, 0]
        np.testing.assert_allclose(ours, ref, atol=5e-3)


class TestStereo:
    def _project_pair(self, stereo, pts_L):
        p_l = stereo.left_camera.project(pts_L)
        p_r = stereo.right_camera.project(np.asarray(linalg.transform_points(stereo.T_RL, pts_L)))
        return p_l, p_r

    def test_fundamental_epipolar_constraint(self, stereo):
        pts = _random_points(32, seed=11)
        p_l, p_r = self._project_pair(stereo, pts)
        und_l = stereo.left_camera.undistort(p_l)
        und_r = stereo.right_camera.undistort(p_r)
        xl = np.concatenate([und_l, np.ones((len(und_l), 1))], axis=1)
        xr = np.concatenate([und_r, np.ones((len(und_r), 1))], axis=1)
        residual = np.einsum("ni,ij,nj->n", xr, stereo.F, xl)
        # normalize by line magnitude to get pixel-ish units
        lines = xl @ stereo.F.T
        dist = np.abs(residual) / np.linalg.norm(lines[:, :2], axis=1)
        assert np.abs(dist).max() < 0.05

    def test_triangulate_clean_points(self, stereo):
        pts = _random_points(24, seed=12)
        p_l, p_r = self._project_pair(stereo, pts)
        recon = stereo.triangulate(p_l, p_r)
        err = np.linalg.norm(recon - pts, axis=1)
        assert err.max() < 1e-3, err.max()

    def test_triangulate_matches_cv2_chain_with_noise(self, stereo):
        pts = _random_points(24, seed=13)
        p_l, p_r = self._project_pair(stereo, pts)
        rng = np.random.default_rng(20)
        p_l = p_l + rng.normal(scale=0.5, size=p_l.shape)
        p_r = p_r + rng.normal(scale=0.5, size=p_r.shape)

        ours = stereo.triangulate(p_l, p_r)

        # reference chain (camera_utils.py:92-110) via cv2
        ul = cv2.fisheye.undistortPoints(
            p_l[:, None, :].astype(np.float32), stereo.left_camera.K, stereo.left_camera.D, P=stereo.left_camera.K
        )[:, 0]
        ur = cv2.fisheye.undistortPoints(
            p_r[:, None, :].astype(np.float32), stereo.right_camera.K, stereo.right_camera.D, P=stereo.right_camera.K
        )[:, 0]
        cl, cr = cv2.correctMatches(stereo.F, ul[None].astype(np.float64), ur[None].astype(np.float64))
        P1 = stereo.left_camera.K @ np.eye(3, 4)
        P2 = stereo.right_camera.K @ stereo.T_RL[:3]
        hom = cv2.triangulatePoints(P1, P2, cl[0].T, cr[0].T).T
        ref = hom[:, :3] / hom[:, 3:4]

        err = np.linalg.norm(ours - ref, axis=1)
        assert err.max() < 5e-3, err.max()  # north-star 3D parity gate

    def test_triangulate_solve_matches_eigh(self, stereo):
        """The fast inhomogeneous DLT (default) agrees with the exact
        homogeneous eigensolve within the 5 mm parity budget even on
        UNCORRECTED noisy points (after Hartley-Sturm correction — the real
        serve path, gated by test_triangulate_matches_cv2_chain_with_noise —
        the two coincide much tighter)."""
        from object_keypoints_tpu.geometry.stereo import triangulate_linear

        pts = _random_points(24, seed=15)
        p_l, p_r = self._project_pair(stereo, pts)
        rng = np.random.default_rng(22)
        p_l = p_l + rng.normal(scale=0.5, size=p_l.shape)
        p_r = p_r + rng.normal(scale=0.5, size=p_r.shape)
        import jax.numpy as jnp

        P1 = jnp.asarray(stereo.left_camera.K @ np.eye(3, 4))
        P2 = jnp.asarray(stereo.right_camera.K @ stereo.T_RL[:3])
        a = np.asarray(triangulate_linear(P1, P2, jnp.asarray(p_l), jnp.asarray(p_r)))
        b = np.asarray(
            triangulate_linear(P1, P2, jnp.asarray(p_l), jnp.asarray(p_r),
                               method="eigh")
        )
        assert np.linalg.norm(a - b, axis=1).max() < 5e-3

    def test_correct_matches_vs_cv2(self, stereo):
        pts = _random_points(16, seed=14)
        p_l, p_r = self._project_pair(stereo, pts)
        ul = stereo.left_camera.undistort(p_l)
        ur = stereo.right_camera.undistort(p_r)
        rng = np.random.default_rng(21)
        ul = ul + rng.normal(scale=1.0, size=ul.shape)
        ur = ur + rng.normal(scale=1.0, size=ur.shape)

        ours_l, ours_r = stereo_ops.correct_matches(
            jnp.asarray(stereo.F, jnp.float32), jnp.asarray(ul, jnp.float32), jnp.asarray(ur, jnp.float32)
        )
        ref_l, ref_r = cv2.correctMatches(stereo.F, ul[None], ur[None])
        np.testing.assert_allclose(np.asarray(ours_l), ref_l[0], atol=2e-2)
        np.testing.assert_allclose(np.asarray(ours_r), ref_r[0], atol=2e-2)

    def test_epipolar_distance_zero_for_true_matches(self, stereo):
        pts = _random_points(8, seed=15)
        p_l, p_r = self._project_pair(stereo, pts)
        ul = stereo.left_camera.undistort(p_l)
        ur = stereo.right_camera.undistort(p_r)
        d = np.asarray(
            stereo_ops.epipolar_distances(
                jnp.asarray(stereo.F, jnp.float32), jnp.asarray(ul, jnp.float32), jnp.asarray(ur, jnp.float32)
            )
        )
        # the diagonal (true matches) should be ~0
        assert np.abs(np.diag(d)).max() < 0.1
        # off-diagonal generally larger
        off = d + np.eye(len(d)) * 1e9
        assert (np.diag(d) <= off.min(axis=1) + 1e-6).all()


class TestFundamentalMatrix:
    def test_against_essential_construction(self, params):
        F = fundamental_matrix(params["T_RL"], params["K"], params["Kp"])
        # standard construction F = Kp^-T [t]x R K^-1 should agree up to scale
        R = params["T_RL"][:3, :3]
        t = params["T_RL"][:3, 3]
        tx = np.asarray(linalg.skew_matrix(t))
        F_std = np.linalg.inv(params["Kp"]).T @ tx @ R @ np.linalg.inv(params["K"])
        ratio = F / F_std
        ratio = ratio[np.abs(F_std) > 1e-12]
        np.testing.assert_allclose(ratio, ratio.mean(), rtol=1e-6)
