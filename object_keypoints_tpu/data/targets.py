"""Training-target rendering: gaussian heatmaps, center fields, depth discs.

Rebuild of the reference's numba-jitted host loops
(perception/datasets/video.py:22-55, 139-263) as vectorized array programs.
The per-pixel Python loops become dense masked broadcasts, so target
rendering can run on device inside the input pipeline (the host here has a
single CPU core — SURVEY.md's hot CPU loop would be the bottleneck).

Two distinct splat flavors exist in the reference and both are kept:

- ``splat_gaussian``: sub-pixel additive gaussian in a truncated window
  around the *int-cast* keypoint (video.py:44-55 ``_set_keypoints``); used
  for the actual training targets.
- ``add_discrete_kernel``: a precomputed 50x50 normalized kernel pasted at
  the *rounded* keypoint (video.py:139-183 ``_add_kernel``); used by the
  reference's tests to build synthetic full-resolution heatmaps.

Geometry constants (video.py:17-20): heatmap 64x64, center/depth disc radius
= heatmap/16 = 4 px, splat window radius = heatmap/8 = 8 px, length scale =
heatmap/32 = 2 px.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

HEATMAP_SIZE = 64
CENTER_RADIUS = HEATMAP_SIZE / 16.0  # 4 px
KERNEL_RADIUS = int(HEATMAP_SIZE / 8.0)  # 8 px window radius
DEFAULT_LENGTH_SCALE = HEATMAP_SIZE / 32.0  # 2 px


def gaussian_kernel_value(x, y, length_scale=DEFAULT_LENGTH_SCALE):
    """exp(-|x - y|^2 / ls^2), the reference's unnormalized RBF
    (video.py:22-25). x, y: (..., 2)."""
    x = jnp.asarray(x)
    y = jnp.asarray(y)
    norm = jnp.sum((x - y) ** 2, axis=-1)
    return jnp.exp(-norm / length_scale**2)


def compute_kernel(size: int, center: int, length_scale=DEFAULT_LENGTH_SCALE):
    """Discretized sum-normalized gaussian kernel (video.py:27-35)."""
    ii = np.arange(size, dtype=np.float32)
    grid = np.stack(np.meshgrid(ii, ii, indexing="ij"), axis=-1)  # (s, s, 2) of (i, j)
    c = np.array([center, center], dtype=np.float32)
    kernel = np.exp(-np.sum((grid - c) ** 2, axis=-1) / float(length_scale) ** 2)
    return (kernel / kernel.sum()).astype(np.float32)


def pixel_grid(height: int, width: int):
    """(2, H, W) grid of pixel centers (x + .5, y + .5) (video.py:37-42)."""
    ys, xs = jnp.meshgrid(jnp.arange(height), jnp.arange(width), indexing="ij")
    return jnp.stack([xs + 0.5, ys + 0.5]).astype(jnp.float32)


def add_discrete_kernel(target, kernel, points, center: int | None = None):
    """Paste a precomputed kernel at each rounded point (host, numpy).

    Behavioral parity with the reference's ``_add_kernel``
    (video.py:139-183) including its window/edge arithmetic; validated by
    tests/test_targets.py against the boundary cases of the reference's
    test_video_dataset.py.
    """
    target = np.asarray(target)
    kernel = np.asarray(kernel)
    size = kernel.shape[0]
    c = size // 2 if center is None else center
    height, width = target.shape
    for point in np.asarray(points):
        x = round(float(point[0]))
        y = round(float(point[1]))
        x_start = max(x - c, 0)
        x_end = max(min(x + c, width), 0)
        y_start = max(y - c, 0)
        y_end = max(min(y + c, height), 0)
        ky0, ky1 = 0, size
        kx0, kx1 = 0, size
        if y_start == 0:
            ky0 = abs(y - c)
        if y + c >= height:
            ky1 = ky0 + size - max(y + c - height, 0)
        if x_start == 0:
            kx0 = abs(x - c)
        if x + c > width:
            kx1 = kx0 + size - max(x + c - width, 0)
        if (ky1 - ky0) < 0 or (kx1 - kx0) < 0:
            continue
        target[y_start:y_end, x_start:x_end] += kernel[ky0:ky1, kx0:kx1]
    return target


def splat_gaussian(shape, points, valid, length_scale=DEFAULT_LENGTH_SCALE,
                   window_radius: int = KERNEL_RADIUS):
    """Additive sub-pixel gaussians, truncated to a window around the
    int-cast point (device equivalent of ``_set_keypoints``,
    video.py:44-55).

    shape: (H, W); points: (P, 2) float (x, y); valid: (P,) mask.
    Returns (H, W).
    """
    h, w = shape
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    px = points[:, 0][:, None, None]
    py = points[:, 1][:, None, None]
    ix = points[:, 0].astype(jnp.int32)[:, None, None]  # truncation like .astype(np.int32)
    iy = points[:, 1].astype(jnp.int32)[:, None, None]
    inside = (
        (xs[None] >= ix - window_radius)
        & (xs[None] <= ix + window_radius)
        & (ys[None] >= iy - window_radius)
        & (ys[None] <= iy + window_radius)
    )
    val = jnp.exp(-((xs[None] - px) ** 2 + (ys[None] - py) ** 2) / length_scale**2)
    val = jnp.where(inside & valid[:, None, None], val, 0.0)
    return jnp.sum(val, axis=0)


def render_heatmaps(points, valid, keypoint_config: tuple, target_size: tuple,
                    length_scale=DEFAULT_LENGTH_SCALE):
    """Per-map gaussian targets with the reference's normalize-and-clip.

    points: (n_objects, n_keypoints, 2) in target space with the synthetic
    center prepended per object; valid: same leading shape;
    keypoint_config: per-map counts *including* the center map, e.g.
    (1, 1, 3). Returns (len(config), H, W), each map scaled by
    1 / max(map_max, 0.5) and clipped to [0, 1]
    (video.py:197-213).
    """
    maps = []
    start = 0
    for n in keypoint_config:
        pts = points[:, start : start + n].reshape(-1, 2)
        vld = valid[:, start : start + n].reshape(-1)
        maps.append(splat_gaussian(target_size, pts, vld, length_scale))
        start += n
    target = jnp.stack(maps)
    peak = jnp.maximum(jnp.max(target, axis=(1, 2)), 0.5)
    return jnp.clip(target / peak[:, None, None], 0.0, 1.0)


def render_center_field(points, valid, keypoint_config: tuple, target_size: tuple,
                        radius=CENTER_RADIUS):
    """Center-offset vector field (video.py:225-242).

    For each non-center keypoint, pixels within ``radius`` of it store the
    vector from the pixel center to the *object center* keypoint. Later
    objects overwrite earlier ones on overlap, like the reference loop.

    points: (n_objects, n_keypoints, 2); returns (T, 2, H, W) with
    T = len(keypoint_config) - 1.
    """
    h, w = target_size
    grid = pixel_grid(h, w)  # (2, H, W)
    T = len(keypoint_config) - 1
    field = jnp.zeros((T, 2, h, w), jnp.float32)
    n_objects = points.shape[0]
    for obj in range(n_objects):
        center = points[obj, 0]
        center_vec = center[:, None, None] - grid  # (2, H, W)
        kp_index = 1
        for t in range(T):
            for _ in range(keypoint_config[1 + t]):
                kp = points[obj, kp_index]
                ok = valid[obj, kp_index]
                dist = jnp.linalg.norm(kp[:, None, None] - grid, axis=0)
                within = (dist < radius) & ok
                field = field.at[t].set(jnp.where(within[None], center_vec, field[t]))
                kp_index += 1
    return field


def render_depth_field(points, points_C, valid, keypoint_config: tuple,
                       target_size: tuple, radius=CENTER_RADIUS):
    """Per-map depth targets (video.py:244-263): pixels within ``radius`` of
    a keypoint store its camera-frame z (center map included).

    points: (n_objects, n_keypoints, 2); points_C: (n_objects, n_keypoints, 3).
    Returns (len(config), H, W).
    """
    h, w = target_size
    grid = pixel_grid(h, w)
    K = len(keypoint_config)
    depth = jnp.zeros((K, h, w), jnp.float32)
    n_objects = points.shape[0]
    for obj in range(n_objects):
        kp_index = 0
        for m in range(K):
            for _ in range(keypoint_config[m]):
                kp = points[obj, kp_index]
                z = points_C[obj, kp_index, 2]
                ok = valid[obj, kp_index]
                dist = jnp.linalg.norm(kp[:, None, None] - grid, axis=0)
                within = (dist < radius) & ok
                depth = depth.at[m].set(jnp.where(within, z, depth[m]))
                kp_index += 1
    return depth


def render_all_targets_host(points, points_C, valid, keypoint_config: tuple,
                            target_size: tuple = (HEATMAP_SIZE, HEATMAP_SIZE),
                            length_scale=DEFAULT_LENGTH_SCALE,
                            radius=CENTER_RADIUS):
    """Host-side twin of :func:`render_all_targets` on the native C++ data
    plane (native/okt_native.cpp via data.native; pure numpy when the lib is
    unavailable). Keeps target rendering entirely off the device — use this
    (``SceneDataset(host_targets=True)`` or ``OKT_HOST_TARGETS=1``) when data
    workers must not contend with a training step for the single chip.

    Same outputs as the device program: (K, H, W) heatmaps, (K, H, W) depth,
    (T, 2, H, W) centers; parity is gated in tests/test_targets.py.
    """
    from object_keypoints_tpu.data import native

    points = np.asarray(points, np.float32)
    points_C = np.asarray(points_C, np.float32)
    valid = np.asarray(valid, bool)
    n_objects, n_keypoints = points.shape[:2]
    h, w = target_size
    K = len(keypoint_config)
    T = K - 1

    # heatmaps: additive truncated gaussians then normalize-and-clip
    # (video.py:197-213)
    heat = np.zeros((K, h, w), np.float32)
    start = 0
    for m, n in enumerate(keypoint_config):
        pts = points[:, start:start + n].reshape(-1, 2)
        vld = valid[:, start:start + n].reshape(-1)
        if vld.any():
            native.splat_gaussian(heat[m], pts[vld], float(length_scale),
                                  KERNEL_RADIUS)
        start += n
    peak = np.maximum(heat.max(axis=(1, 2)), 0.5)
    heat = np.clip(heat / peak[:, None, None], 0.0, 1.0)

    # depth discs (video.py:244-263): per map, objects in order so later
    # objects overwrite earlier on overlap, like the device renderer.
    depth = np.zeros((K, h, w), np.float32)
    kp_of_map = []
    start = 0
    for n in keypoint_config:
        kp_of_map.append(list(range(start, start + n)))
        start += n
    for m in range(K):
        pts, zs = [], []
        for obj in range(n_objects):
            for kp_index in kp_of_map[m]:
                if valid[obj, kp_index]:
                    pts.append(points[obj, kp_index])
                    zs.append([points_C[obj, kp_index, 2]])
        if pts:
            native.fill_discs(depth[m:m + 1], np.asarray(pts, np.float32),
                              np.asarray(zs, np.float32), float(radius))

    # center-offset field (video.py:225-242): the stored value varies per
    # pixel (object_center - pixel_center), so fill constant (cx, cy, 1)
    # discs and subtract the pixel grid afterwards.
    grid = np.asarray(pixel_grid(h, w))  # (2, H, W)
    centers = np.zeros((T, 2, h, w), np.float32)
    for t in range(T):
        scratch = np.zeros((3, h, w), np.float32)
        pts, vals = [], []
        for obj in range(n_objects):
            center = points[obj, 0]
            for kp_index in kp_of_map[1 + t]:
                if valid[obj, kp_index]:
                    pts.append(points[obj, kp_index])
                    vals.append([center[0], center[1], 1.0])
        if pts:
            native.fill_discs(scratch, np.asarray(pts, np.float32),
                              np.asarray(vals, np.float32), float(radius))
        mask = scratch[2] > 0
        centers[t, 0] = np.where(mask, scratch[0] - grid[0], 0.0)
        centers[t, 1] = np.where(mask, scratch[1] - grid[1], 0.0)
    return heat, depth, centers


@functools.partial(jax.jit, static_argnames=("keypoint_config", "target_size"))
def render_all_targets(points, points_C, valid, keypoint_config: tuple,
                       target_size: tuple = (HEATMAP_SIZE, HEATMAP_SIZE)):
    """One jitted program producing (heatmaps, depth, centers) for a frame.

    Equivalent of the target portion of SceneDataset._extract_example
    (video.py:185-223) — heatmaps use keypoints scaled to target space;
    callers pass points already scaled.
    """
    heat = render_heatmaps(points, valid, keypoint_config, target_size)
    centers = render_center_field(points, valid, keypoint_config, target_size)
    depth = render_depth_field(points, points_C, valid, keypoint_config, target_size)
    return heat, depth, centers
