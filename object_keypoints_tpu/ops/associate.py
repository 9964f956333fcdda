"""Association primitives: center-offset grouping, masked k-means, epipolar
matching — all fixed-shape and jit-able.

Rebuilds the ragged Python logic of the reference ObjectExtraction
(perception/pipeline.py:93-153: nearest-predicted-center assignment with a
20 px reject, argmax-confidence or sklearn-KMeans capacity resolution) and
the stereo AssociationComponent documented by the reference's stale tests
(test/test_pipeline.py:208-261: greedy mutually-exclusive epipolar matching
with -1 for unmatched) as masked dense ops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def assign_to_centers(points, points_valid, offsets, center_points, center_valid,
                      reject_distance: float = 20.0):
    """Assign detected keypoints to detected object centers.

    Mirrors perception/pipeline.py:104-124: the predicted center of a point
    of type t at sub-pixel (x, y) is ``(round(x)+.5, round(y)+.5) +
    offsets[t, :, round(y), round(x)]``; the point joins the nearest
    detected center unless that distance exceeds ``reject_distance``.

    points: (T, M, 2) sub-pixel (x, y) detections per keypoint type
    points_valid: (T, M) bool
    offsets: (T, 2, H, W) center-offset field (prediction-space)
    center_points: (C, 2) detected centers (x, y)
    center_valid: (C,) bool

    Returns (assignment (T, M) int32 in [-1, C), predicted_centers (T, M, 2)).
    """
    T, M, _ = points.shape
    h, w = offsets.shape[-2:]
    # round + clip exactly like np.round (half-to-even) + np.clip
    xy_int = jnp.clip(
        jnp.round(points).astype(jnp.int32),
        jnp.zeros(2, jnp.int32),
        jnp.array([w - 1, h - 1], jnp.int32),
    )
    tix = jnp.arange(T)[:, None]
    off = offsets[tix, :, xy_int[..., 1], xy_int[..., 0]]  # (T, M, 2)
    grid = xy_int.astype(points.dtype) + 0.5  # pixel-center convention (pipeline.py:102)
    predicted_centers = grid + off

    # distances to every detected center
    diff = predicted_centers[:, :, None, :] - center_points[None, None, :, :]
    dist = jnp.sqrt(jnp.sum(diff * diff, axis=-1))  # (T, M, C)
    dist = jnp.where(center_valid[None, None, :], dist, jnp.inf)
    nearest = jnp.argmin(dist, axis=-1)
    min_dist = jnp.min(dist, axis=-1)
    ok = points_valid & (min_dist <= reject_distance)
    assignment = jnp.where(ok, nearest, -1)
    return assignment.astype(jnp.int32), predicted_centers


def masked_kmeans(points, mask, weights, k: int, iters: int = 20):
    """Deterministic Lloyd k-means over masked points.

    Replaces the reference's sklearn KMeans(init='random')
    (pipeline.py:146-148) with a deterministic, jit-able version: centers
    initialize from the k highest-weight valid points, then run a fixed
    number of Lloyd iterations. points: (M, 2); mask: (M,); weights: (M,).
    Returns (k, 2) cluster centers.
    """
    neg_inf = jnp.asarray(-jnp.inf, points.dtype)
    score = jnp.where(mask, weights, neg_inf)
    _, init_idx = jax.lax.top_k(score, k)
    centers = points[init_idx]

    def step(centers, _):
        d = jnp.sum((points[:, None, :] - centers[None, :, :]) ** 2, axis=-1)  # (M, k)
        assign = jnp.argmin(d, axis=-1)
        one_hot = (assign[:, None] == jnp.arange(k)[None, :]) & mask[:, None]
        counts = jnp.sum(one_hot, axis=0).astype(points.dtype)
        sums = jnp.einsum("mk,md->kd", one_hot.astype(points.dtype), points)
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers)
        return new, None

    centers, _ = jax.lax.scan(step, centers, None, length=iters)
    return centers


def resolve_capacity(points, mask, confidence, capacity: int):
    """Capacity resolution for one (object, keypoint-type) cell.

    Mirrors perception/pipeline.py:128-152:
      count <= capacity -> keep points as-is,
      count >  capacity, capacity == 1 -> argmax-confidence point,
      count >  capacity, capacity  > 1 -> k-means cluster centers.

    points: (M, 2), mask: (M,), confidence: (M,). Returns
    (out (capacity, 2), out_valid (capacity,)).
    """
    m = points.shape[0]
    count = jnp.sum(mask.astype(jnp.int32))

    # keep-branch: compact the first `capacity` valid points to the front.
    order = jnp.argsort(jnp.where(mask, 0, 1), stable=True)  # valid first, stable
    kept = points[order[:capacity]]
    kept_valid = mask[order[:capacity]]

    if capacity == 1:
        best = jnp.argmax(jnp.where(mask, confidence, -jnp.inf))
        resolved = points[best][None]
        resolved_valid = jnp.ones((1,), bool)
    else:
        resolved = masked_kmeans(points, mask, confidence, capacity)
        resolved_valid = jnp.ones((capacity,), bool)

    over = count > capacity
    out = jnp.where(over, resolved, kept)
    out_valid = jnp.where(over, resolved_valid, kept_valid)
    # cells with zero detections stay invalid
    out_valid = out_valid & (count > 0)
    assert out.shape[0] == capacity and m == mask.shape[0]
    return out, out_valid


@functools.partial(jax.jit, static_argnames=("max_matches",))
def greedy_epipolar_match(distances, left_valid, right_valid,
                          threshold: float = 2.0, max_matches: int = None):
    """Greedy mutually-exclusive assignment on a distance matrix.

    Device rebuild of the stereo AssociationComponent semantics documented
    by the reference's stale tests (test/test_pipeline.py:208-261): each
    left point matches at most one right point, globally-nearest pairs
    first, matches beyond ``threshold`` rejected, unmatched -> -1.

    distances: (L, R) point-to-epipolar-line distances; returns (L,) int32.
    """
    L, R = distances.shape
    if max_matches is None:
        max_matches = min(L, R)
    big = jnp.asarray(jnp.inf, distances.dtype)
    d0 = jnp.where(left_valid[:, None] & right_valid[None, :], distances, big)
    assignment0 = jnp.full((L,), -1, jnp.int32)

    def body(_, state):
        d, assignment = state
        flat = jnp.argmin(d)
        i, j = flat // R, flat % R
        best = d[i, j]
        take = best <= threshold
        assignment = jnp.where(
            take, assignment.at[i].set(j.astype(jnp.int32)), assignment
        )
        d = jnp.where(take, d.at[i, :].set(big).at[:, j].set(big), d)
        return d, assignment

    _, assignment = jax.lax.fori_loop(0, max_matches, body, (d0, assignment0))
    return assignment
