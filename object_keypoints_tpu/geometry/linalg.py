"""SE3 / small linear-algebra helpers.

Functional parity with the reference helpers at
perception/utils/linalg.py:4-23, rebuilt on jax.numpy so every helper is
jit-able and batchable (the reference versions are host-side NumPy). All
functions accept NumPy or JAX arrays and return JAX arrays; callers on the
host path can wrap with ``np.asarray``.
"""

from __future__ import annotations

import jax.numpy as jnp

_HIGHEST = "highest"


def skew_matrix(v):
    """3-vector -> 3x3 skew-symmetric cross-product matrix.

    Reference: perception/utils/linalg.py:4-7. Supports batched input
    (..., 3) -> (..., 3, 3).
    """
    v = jnp.asarray(v)
    zero = jnp.zeros_like(v[..., 0])
    rows = jnp.stack(
        [
            jnp.stack([zero, -v[..., 2], v[..., 1]], axis=-1),
            jnp.stack([v[..., 2], zero, -v[..., 0]], axis=-1),
            jnp.stack([-v[..., 1], v[..., 0], zero], axis=-1),
        ],
        axis=-2,
    )
    return rows


def inv_transform(T):
    """Inverse of a rigid 4x4 transform (R^T, -R^T t).

    Reference: perception/utils/linalg.py:9-13. Batched: (..., 4, 4).
    """
    T = jnp.asarray(T)
    R_t = jnp.swapaxes(T[..., :3, :3], -1, -2)
    t = -jnp.einsum("...ij,...j->...i", R_t, T[..., :3, 3], precision=_HIGHEST)
    top = jnp.concatenate([R_t, t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=top.dtype), top.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(T, points):
    """Apply rigid transform T (4x4) to (..., 3) points.

    Reference: perception/utils/linalg.py:15-20.
    """
    T = jnp.asarray(T)
    points = jnp.asarray(points)
    return jnp.einsum("ij,...j->...i", T[:3, :3], points, precision=_HIGHEST) + T[:3, 3]


def rotation_matrix_to_euler_xyz(R):
    """Rotation matrix -> intrinsic xyz Euler angles (radians).

    Matches scipy's Rotation.as_euler('xyz') convention used by the
    reference (perception/utils/linalg.py:22-23) for non-degenerate
    rotations. R: (..., 3, 3).
    """
    R = jnp.asarray(R)
    # scipy 'xyz' (extrinsic lowercase) decomposition of R = Rz(c) Ry(b) Rx(a)
    sy = -R[..., 2, 0]
    sy = jnp.clip(sy, -1.0, 1.0)
    b = jnp.arcsin(sy)
    a = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    c = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def angle_between(R1, R2):
    """Euler-angle decomposition of the relative rotation R1^T R2.

    Reference: perception/utils/linalg.py:22-23 (scipy-based); this version
    is jit-able.
    """
    R1 = jnp.asarray(R1)
    R2 = jnp.asarray(R2)
    return rotation_matrix_to_euler_xyz(jnp.matmul(jnp.swapaxes(R1, -1, -2), R2, precision=_HIGHEST))


def rotation_angle(R1, R2):
    """Magnitude (radians) of the relative rotation between R1 and R2.

    Used for view-orthogonality scoring when picking labeling frame pairs
    (reference scripts/label.py:113-134 uses the Euler norm; the geodesic
    angle here is the cleaner equivalent).
    """
    R = jnp.matmul(jnp.swapaxes(jnp.asarray(R1), -1, -2), jnp.asarray(R2), precision=_HIGHEST)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    return jnp.arccos(jnp.clip((trace - 1.0) / 2.0, -1.0, 1.0))
