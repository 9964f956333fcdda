"""Geometry core: SE3 linear algebra, camera models, stereo triangulation.

Everything here is pure ``jax.numpy`` and jit-able; thin object wrappers
mirror the reference API (perception/utils/camera_utils.py,
perception/utils/linalg.py) for script-level ergonomics.
"""

from object_keypoints_tpu.geometry.linalg import (
    skew_matrix,
    inv_transform,
    transform_points,
    angle_between,
)
from object_keypoints_tpu.geometry.cameras import (
    PinholeCamera,
    RadTanPinholeCamera,
    FisheyeCamera,
    StereoCamera,
    camera_matrix,
    projection_matrix,
    from_calibration,
    load_calibration_params,
    scale_camera_matrix,
    fundamental_matrix,
)

__all__ = [
    "skew_matrix",
    "inv_transform",
    "transform_points",
    "angle_between",
    "PinholeCamera",
    "RadTanPinholeCamera",
    "FisheyeCamera",
    "StereoCamera",
    "camera_matrix",
    "projection_matrix",
    "from_calibration",
    "load_calibration_params",
    "scale_camera_matrix",
    "fundamental_matrix",
]
