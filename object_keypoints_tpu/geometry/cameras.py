"""Camera models: pinhole, radtan-pinhole, equidistant fisheye (Kalibr).

TPU-first rebuild of perception/utils/camera_utils.py. The reference calls
into OpenCV on the host (cv2.fisheye.projectPoints/undistortPoints,
cv2.projectPoints, cv2.triangulatePoints, cv2.correctMatches); here every
camera operation is a pure jax.numpy function with *fixed* iteration counts
so the whole preprocessing / unprojection path can live inside one jitted
XLA program:

- fisheye (equidistant) projection is closed form,
- fisheye undistortion solves theta from theta_d with a fixed 10-step
  Newton iteration (same scheme OpenCV uses internally),
- radtan undistortion uses a fixed-point iteration,
- stereo triangulation (see stereo.py) is a batched DLT via 4x4
  eigendecomposition, vmappable over points.

Thin object wrappers at the bottom mirror the reference class API
(PinholeCamera / RadTanPinholeCamera / FisheyeCamera / StereoCamera,
camera_utils.py:7-117) so scripts and tests read the same.

Numerical parity is gated in tests/test_geometry.py against cv2 on the real
calibration file (config/calibration.yaml).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
import yaml

from object_keypoints_tpu.geometry import linalg

# ---------------------------------------------------------------------------
# Functional core (pure jnp, jit-able)
# ---------------------------------------------------------------------------

_NEWTON_ITERS = 10  # matches OpenCV's fisheye undistort iteration budget
_RADTAN_ITERS = 20


def apply_K(xy, K):
    """(..., 2) normalized image coords -> pixel coords."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    return jnp.stack([xy[..., 0] * fx + cx, xy[..., 1] * fy + cy], axis=-1)


def apply_Kinv(uv, K):
    """(..., 2) pixel coords -> normalized image coords."""
    fx = K[..., 0, 0]
    fy = K[..., 1, 1]
    cx = K[..., 0, 2]
    cy = K[..., 1, 2]
    return jnp.stack([(uv[..., 0] - cx) / fx, (uv[..., 1] - cy) / fy], axis=-1)


def _fisheye_theta_d(theta, D):
    th2 = theta * theta
    return theta * (1.0 + th2 * (D[0] + th2 * (D[1] + th2 * (D[2] + th2 * D[3]))))


def fisheye_distort_normalized(xy, D):
    """Apply the equidistant distortion to normalized pinhole coords (a, b)."""
    r = jnp.sqrt(jnp.sum(xy * xy, axis=-1))
    theta = jnp.arctan(r)
    theta_d = _fisheye_theta_d(theta, D)
    scale = jnp.where(r > 1e-12, theta_d / jnp.maximum(r, 1e-12), 1.0)
    return xy * scale[..., None]


def fisheye_project(points_C, K, D):
    """Project camera-frame 3D points through the equidistant fisheye model.

    Closed-form equivalent of cv2.fisheye.projectPoints
    (reference camera_utils.py:64-73). points_C: (..., 3) -> (..., 2).
    """
    z = points_C[..., 2]
    ab = points_C[..., :2] / z[..., None]
    return apply_K(fisheye_distort_normalized(ab, D), K)


def fisheye_undistort_normalized(xy_dist, D):
    """Invert the equidistant distortion on normalized coords.

    Solves theta from theta_d = theta * (1 + k1 th^2 + ... + k4 th^8) with a
    fixed 10-step Newton iteration (the same update OpenCV's
    cv2.fisheye.undistortPoints runs), fully vectorized.
    """
    theta_d = jnp.sqrt(jnp.sum(xy_dist * xy_dist, axis=-1))
    # cv2 clips theta_d into [-pi, pi]
    theta_d_c = jnp.clip(theta_d, -jnp.pi, jnp.pi)

    def newton_step(theta, _):
        th2 = theta * theta
        k0, k1, k2, k3 = D[0] * th2, D[1] * th2 * th2, D[2] * th2**3, D[3] * th2**4
        f = theta * (1.0 + k0 + k1 + k2 + k3) - theta_d_c
        fp = 1.0 + 3.0 * k0 + 5.0 * k1 + 7.0 * k2 + 9.0 * k3
        return theta - f / fp, None

    theta, _ = jax.lax.scan(newton_step, theta_d_c, None, length=_NEWTON_ITERS)
    scale = jnp.where(theta_d > 1e-9, jnp.tan(theta) / jnp.maximum(theta_d, 1e-9), 1.0)
    return xy_dist * scale[..., None]


def fisheye_undistort_points(uv, K, D, P=None):
    """Pixel coords -> undistorted pixel coords (projected through P).

    Equivalent of cv2.fisheye.undistortPoints(uv, K, D, P=P)
    (reference camera_utils.py:75-81 with P=K).
    """
    xy = fisheye_undistort_normalized(apply_Kinv(uv, K), D)
    if P is None:
        return xy
    return apply_K(xy, P)


def _radtan_distort_terms(xy, D):
    k1, k2, p1, p2 = D[0], D[1], D[2], D[3]
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * k2)
    dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return radial, jnp.stack([dx, dy], axis=-1)


def radtan_distort_normalized(xy, D):
    radial, tang = _radtan_distort_terms(xy, D)
    return xy * radial[..., None] + tang


def radtan_project(points_C, K, D):
    """Equivalent of cv2.projectPoints with a 4-coeff radtan model
    (reference camera_utils.py:45-55)."""
    z = points_C[..., 2]
    xy = points_C[..., :2] / z[..., None]
    return apply_K(radtan_distort_normalized(xy, D), K)


def radtan_undistort_normalized(xy_dist, D):
    """Fixed-point inversion of the radtan distortion (cv2.undistortPoints)."""

    def step(xy, _):
        radial, tang = _radtan_distort_terms(xy, D)
        return (xy_dist - tang) / radial[..., None], None

    xy, _ = jax.lax.scan(step, xy_dist, None, length=_RADTAN_ITERS)
    return xy


def radtan_undistort_points(uv, K, D, P=None):
    xy = radtan_undistort_normalized(apply_Kinv(uv, K), D)
    if P is None:
        return xy
    return apply_K(xy, P)


def unproject(uv, z, Kinv):
    """Lift pixel coords + depth into the camera frame (pinhole, no
    distortion — callers undistort first). Reference camera_utils.py:31-34.

    uv: (..., 2), z: (...,) -> (..., 3)
    """
    ones = jnp.ones_like(uv[..., :1])
    xyw = jnp.concatenate([uv, ones], axis=-1)
    rays = jnp.einsum("ij,...j->...i", Kinv, xyw, precision="highest")
    return rays * z[..., None]


def project_points(points_W, T_CW, K, D, model: str):
    """World points -> pixels for either supported distortion model."""
    p_C = linalg.transform_points(T_CW, points_W)
    if model == "equidistant":
        return fisheye_project(p_C, K, D)
    elif model == "radtan":
        return radtan_project(p_C, K, D)
    raise ValueError(f"Unknown distortion model {model!r}")


# ---------------------------------------------------------------------------
# Calibration-file helpers (host-side, mirror camera_utils.py:119-189)
# ---------------------------------------------------------------------------


def camera_matrix(intrinsics):
    """[fx, fy, cx, cy] -> 3x3 K. Reference camera_utils.py:119-123."""
    fx, fy, cx, cy = intrinsics
    return np.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])


def projection_matrix(K, T_CW):
    """K @ T_CW[:3, :]. Reference camera_utils.py:125-130."""
    return np.asarray(K) @ np.asarray(T_CW)[:3, :]


def scale_camera_matrix(K, scaling_factor):
    """Scale focal lengths + principal point. Reference camera_utils.py:172-182."""
    out = np.array(K, copy=True)
    out[0, 0] = K[0, 0] * scaling_factor[0]
    out[1, 1] = K[1, 1] * scaling_factor[1]
    out[0, 2] = K[0, 2] * scaling_factor[0]
    out[1, 2] = K[1, 2] * scaling_factor[1]
    return out


def fundamental_matrix(T_RL, K, Kp):
    """Fundamental matrix of the rig: l_R = F @ x_L (left pixel -> right
    epipolar line). Reference camera_utils.py:184-189 (F = Kp^-T R K^T [e]x
    with e = K R^T t the left epipole)."""
    T_RL = np.asarray(T_RL)
    R = T_RL[:3, :3]
    t = T_RL[:3, 3]
    C = np.asarray(linalg.skew_matrix(jnp.asarray(K @ R.T @ t)))
    return np.linalg.inv(Kp).T @ R @ K.T @ C


def from_calibration(calibration_file):
    """Build the cam0 camera from a Kalibr YAML. Reference camera_utils.py:132-144."""
    with open(calibration_file, "rt") as f:
        calibration = yaml.safe_load(f.read())
    camera = calibration["cam0"]
    K = camera_matrix(camera["intrinsics"])
    D = np.array(camera["distortion_coeffs"])
    if camera["distortion_model"] == "equidistant" and camera["camera_model"] == "pinhole":
        return FisheyeCamera(K, D, camera["resolution"][::-1])
    elif camera["distortion_model"] == "radtan" and camera["camera_model"] == "pinhole":
        return RadTanPinholeCamera(K, D, camera["resolution"][::-1])
    raise ValueError(f"Unrecognized calibration type {camera['distortion_model']}.")


def load_calibration_params(calibration_file):
    """Load a Kalibr stereo calibration into a dict.

    Reference camera_utils.py:146-170; keys K, Kp, D, Dp, T_LR, T_RL,
    image_size (height, width)."""
    with open(calibration_file, "rt") as f:
        calibration = yaml.safe_load(f.read())
    left = calibration["cam0"]
    right = calibration["cam1"]
    K = camera_matrix(left["intrinsics"])
    Kp = camera_matrix(right["intrinsics"])
    D = np.array(left["distortion_coeffs"])
    Dp = np.array(right["distortion_coeffs"])
    T_RL = np.array(right["T_cn_cnm1"])
    T_LR = np.eye(4)
    T_LR[:3, :3] = T_RL[:3, :3].T
    T_LR[:3, 3] = -T_LR[:3, :3] @ T_RL[:3, 3]
    image_size = right["resolution"][::-1]
    return {
        "K": K,
        "Kp": Kp,
        "D": D,
        "Dp": Dp,
        "T_LR": T_LR,
        "T_RL": T_RL,
        "image_size": image_size,
    }


# ---------------------------------------------------------------------------
# Object wrappers (host-facing, reference API parity)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("model",))
def _project_jit(points, T_CW, K, D, model):
    return project_points(points, T_CW, K, D, model)


@functools.partial(jax.jit, static_argnames=("model",))
def _undistort_jit(uv, K, D, P, model):
    if model == "equidistant":
        return fisheye_undistort_points(uv, K, D, P)
    return radtan_undistort_points(uv, K, D, P)


def _pad_pow2(points, feature_dims: int = 1):
    """Pad the leading point count to a power of two so the jitted camera
    kernels see a small set of stable shapes (per-frame detection counts
    vary; unpadded they force a recompile per new count)."""
    points = np.asarray(points)
    n = points.shape[0]
    if n == 0:
        return points, 0
    m = 1 << (n - 1).bit_length()
    if m == n:
        return points, n
    pad = np.zeros((m - n, *points.shape[1:]), points.dtype)
    pad[..., -1] = 1.0 if points.ndim > 1 and points.shape[-1] == 3 else pad[..., -1]
    return np.concatenate([points, pad], axis=0), n


@jax.jit
def _unproject_jit(uv, z, Kinv):
    return unproject(uv, z, Kinv)


class PinholeCamera:
    """Distortion-agnostic pinhole base. Reference camera_utils.py:7-43.

    NOTE (deliberate reference-parity quirk): ``scale``/``cut`` return a
    FisheyeCamera regardless of the subclass, exactly like the reference
    (camera_utils.py:18-29). All first-party call sites are fisheye, so the
    quirk is preserved rather than "fixed" silently.
    """

    distortion_model = "none"

    def __init__(self, K, D, image_size):
        self.K = np.asarray(K, dtype=np.float64)
        self.Kinv = np.linalg.inv(self.K)
        self.D = np.asarray(D, dtype=np.float64)
        self.image_size = np.array(image_size, dtype=np.float64)
        assert np.abs(self.K[0, 2] * 2.0 - self.image_size[1]) < 0.05 * self.image_size[1]

    def scale(self, scale):
        K = scale_camera_matrix(self.K, np.ones(2) * scale)
        return FisheyeCamera(K, self.D, self.image_size * scale)

    def cut(self, offset):
        offset = np.asarray(offset, dtype=np.float64)
        K = self.K.copy()
        K[0, 2] = self.K[0, 2] - offset[0]
        K[1, 2] = self.K[1, 2] - offset[1]
        image_size = self.image_size - 2.0 * offset[::-1]
        return FisheyeCamera(K, self.D, image_size)

    def unproject(self, xys, zs):
        out = _unproject_jit(
            jnp.asarray(xys, dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32),
            jnp.asarray(zs).reshape(-1),
            jnp.asarray(self.Kinv),
        )
        return np.asarray(out)

    def in_frame(self, x):
        x = np.asarray(x)
        under = (x <= 0.0).any(axis=1)
        over = (x >= self.image_size).any(axis=1)
        return ~(under | over)


class RadTanPinholeCamera(PinholeCamera):
    """radtan distortion camera. Reference camera_utils.py:45-62."""

    distortion_model = "radtan"

    def project(self, X, T_CW=np.eye(4)):
        Xp, n = _pad_pow2(X)
        out = _project_jit(jnp.asarray(Xp), jnp.asarray(T_CW), jnp.asarray(self.K), jnp.asarray(self.D), "radtan")
        return np.asarray(out)[:n]

    def undistort(self, xy):
        xyp, n = _pad_pow2(xy)
        out = _undistort_jit(jnp.asarray(xyp), jnp.asarray(self.K), jnp.asarray(self.D), jnp.asarray(self.K), "radtan")
        return np.asarray(out)[:n]


class FisheyeCamera(PinholeCamera):
    """Kalibr pinhole-equi camera. Reference camera_utils.py:64-81."""

    distortion_model = "equidistant"

    def project(self, X, T_CW=np.eye(4)):
        Xp, n = _pad_pow2(X)
        out = _project_jit(jnp.asarray(Xp), jnp.asarray(T_CW), jnp.asarray(self.K), jnp.asarray(self.D), "equidistant")
        return np.asarray(out)[:n]

    def undistort(self, xy):
        xyp, n = _pad_pow2(xy)
        out = _undistort_jit(jnp.asarray(xyp), jnp.asarray(self.K), jnp.asarray(self.D), jnp.asarray(self.K), "equidistant")
        return np.asarray(out)[:n]


class StereoCamera:
    """Stereo rig with on-device triangulation. Reference camera_utils.py:84-117.

    triangulate() = undistort both views -> optimal epipolar correction
    (Hartley–Sturm equivalent; see stereo.py) -> batched DLT. The reference
    chains cv2.fisheye.undistortPoints, cv2.correctMatches and
    cv2.triangulatePoints on the host.
    """

    def __init__(self, left_camera, right_camera, T_RL):
        self.left_camera = left_camera
        self.right_camera = right_camera
        self.T_RL = np.asarray(T_RL, dtype=np.float64)
        self.T_LR = np.asarray(linalg.inv_transform(jnp.asarray(self.T_RL)))
        self.F = fundamental_matrix(self.T_RL, self.left_camera.K, self.right_camera.K)

    def triangulate(self, left_keypoints, right_keypoints):
        from object_keypoints_tpu.geometry import stereo as stereo_ops

        left_keypoints, n = _pad_pow2(np.asarray(left_keypoints, np.float64))
        right_keypoints, _ = _pad_pow2(np.asarray(right_keypoints, np.float64))
        out = stereo_ops.triangulate_pixels(
            jnp.asarray(left_keypoints, dtype=jnp.float32),
            jnp.asarray(right_keypoints, dtype=jnp.float32),
            jnp.asarray(self.left_camera.K, dtype=jnp.float32),
            jnp.asarray(self.left_camera.D, dtype=jnp.float32),
            jnp.asarray(self.right_camera.K, dtype=jnp.float32),
            jnp.asarray(self.right_camera.D, dtype=jnp.float32),
            jnp.asarray(self.T_RL, dtype=jnp.float32),
            jnp.asarray(self.F, dtype=jnp.float32),
        )
        return np.asarray(out)[:n]

    @classmethod
    def from_file(cls, calibration_file):
        params = load_calibration_params(calibration_file)
        left = FisheyeCamera(params["K"], params["D"], params["image_size"])
        right = FisheyeCamera(params["Kp"], params["Dp"], params["image_size"])
        return cls(left, right, params["T_RL"])
