"""Box NMS family: greedy IoU NMS, soft-NMS, merge soft-NMS, IoU matrix.

The reference ships these as Cython (corner_net_lite/core/external/nms.pyx
and bbox.pyx) with sequential greedy loops. TPU-native versions are
fixed-shape array programs: the greedy dependency chain becomes a
``lax.fori_loop`` over detections with masked updates — compile-friendly
(static bounds), vectorized across the O(N) inner comparisons.

All functions take (N, 5) [x1, y1, x2, y2, score] detections, sorted or
not, and return masks/updated scores rather than ragged keep-lists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def bbox_overlaps(boxes, query_boxes):
    """(N, 4) x (K, 4) -> (N, K) IoU-with-query-area denominator... exactly
    the reference's overlap: intersection / union (bbox.pyx:15-55)."""
    boxes = jnp.asarray(boxes)
    query = jnp.asarray(query_boxes)
    lt = jnp.maximum(boxes[:, None, :2], query[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:4], query[None, :, 2:4])
    wh = jnp.clip(rb - lt + 1.0, 0.0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_b = (boxes[:, 2] - boxes[:, 0] + 1.0) * (boxes[:, 3] - boxes[:, 1] + 1.0)
    area_q = (query[:, 2] - query[:, 0] + 1.0) * (query[:, 3] - query[:, 1] + 1.0)
    union = area_b[:, None] + area_q[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _iou_matrix(dets):
    return bbox_overlaps(dets[:, :4], dets[:, :4])


@functools.partial(jax.jit, static_argnames=())
def nms_mask(dets, threshold: float):
    """Greedy IoU NMS (nms.pyx:17-69). Returns a boolean keep mask over the
    input order (the reference returns kept indices of score-sorted input;
    sort first for identical behavior)."""
    n = dets.shape[0]
    order = jnp.argsort(-dets[:, 4], stable=True)
    sorted_dets = dets[order]
    iou = _iou_matrix(sorted_dets)

    def body(i, keep):
        # suppress i unless kept-so-far say otherwise; then i suppresses later
        keep_i = keep[i]
        suppress = (iou[i] > threshold) & keep_i
        later = jnp.arange(n) > i
        return jnp.where(later & suppress, False, keep)

    keep_sorted = jax.lax.fori_loop(0, n, body, jnp.ones(n, bool))
    keep = jnp.zeros(n, bool).at[order].set(keep_sorted)
    return keep


def soft_nms(dets, sigma: float = 0.5, Nt: float = 0.3, threshold: float = 0.001,
             method: int = 0):
    """Soft-NMS (nms.pyx:71+): decay overlapping scores instead of removing.

    method: 0 = hard (classic NMS), 1 = linear decay, 2 = gaussian decay.
    Returns updated (N, 5) detections; boxes whose decayed score falls below
    ``threshold`` get score 0 (callers filter). Sequential-greedy like the
    reference, as a fori_loop over the score-sorted order recomputed each
    step (the reference re-sorts in place).
    """
    dets = jnp.asarray(dets, jnp.float32)
    n = dets.shape[0]

    def body(_, state):
        scores, alive = state
        # pick the highest remaining un-processed score
        masked = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(masked)
        valid = masked[i] > -jnp.inf
        iou = bbox_overlaps(dets[None, i, :4], dets[:, :4])[0]
        if method == 1:
            weight = jnp.where(iou > Nt, 1.0 - iou, 1.0)
        elif method == 2:
            weight = jnp.exp(-(iou * iou) / sigma)
        else:
            weight = jnp.where(iou > Nt, 0.0, 1.0)
        weight = weight.at[i].set(1.0)
        new_scores = jnp.where(alive & valid, scores * weight, scores)
        new_scores = jnp.where(new_scores < threshold, 0.0, new_scores)
        alive = alive.at[i].set(False)
        return new_scores, alive

    scores, _ = jax.lax.fori_loop(0, n, body, (dets[:, 4], jnp.ones(n, bool)))
    return dets.at[:, 4].set(scores)


@functools.partial(jax.jit, static_argnames=("sigma", "Nt", "threshold",
                                             "method"))
def soft_nms_batch(dets, sigma: float = 0.5, Nt: float = 0.3,
                   threshold: float = 0.001, method: int = 0):
    """Per-class soft-NMS as ONE device program: vmap of :func:`soft_nms`
    over a (C, N, 5) class-padded stack.

    The reference's test drives loop soft-NMS per category on the host
    (core/test/cornernet_saccade.py:383-391 runs the Cython once per class)
    — on a tunneled accelerator that is one dispatch round-trip per class
    (80 for COCO). Here the caller pads each class's detections to a common
    N (pad rows: far-away box, score 0 — IoU 0 with everything, decayed to
    nothing) and all classes run in a single fused dispatch.
    """
    return jax.vmap(
        lambda d: soft_nms(d, sigma=sigma, Nt=Nt, threshold=threshold,
                           method=method)
    )(jnp.asarray(dets, jnp.float32))


@functools.partial(jax.jit, static_argnames=("sigma", "Nt", "threshold",
                                             "method", "weight_exp"))
def soft_nms_merge_batch(dets, sigma: float = 0.5, Nt: float = 0.3,
                         threshold: float = 0.001, method: int = 2,
                         weight_exp: float = 6.0):
    """vmap of :func:`soft_nms_merge` over a (C, N, 7) class-padded stack —
    the merge-mode analog of :func:`soft_nms_batch` (one dispatch for all
    classes instead of the reference's per-class Cython loop,
    core/test/cornernet.py:160-176)."""
    return jax.vmap(
        lambda d: soft_nms_merge(d, sigma=sigma, Nt=Nt, threshold=threshold,
                                 method=method, weight_exp=weight_exp)
    )(jnp.asarray(dets, jnp.float32))


# Pad value for the *_batch filler rows: a unit box far outside any image
# so bbox_overlaps' +1 extents give it IoU 0 with every real box; score 0
# means every real (positive-score) box is processed before any filler.
PAD_BOX = (-1e6, -1e6, -1e6, -1e6, 0.0)


def pad_class_dets(per_class, n_pad: int, width: int = 5):
    """Stack ragged per-class (n_j, width) arrays into (C, n_pad, width)
    with PAD_BOX filler (host-side helper for the *_batch programs);
    columns beyond 5 (corner scores) pad as 0."""
    import numpy as np

    out = np.zeros((len(per_class), n_pad, width), np.float32)
    out[:, :, :5] = np.asarray(PAD_BOX, np.float32)
    for j, d in enumerate(per_class):
        out[j, : len(d)] = d
    return out


def soft_nms_merge(dets, sigma: float = 0.5, Nt: float = 0.3,
                   threshold: float = 0.001, method: int = 2,
                   weight_exp: float = 6.0):
    """Soft-NMS with box-coordinate merging (nms.pyx soft_nms_merge, used at
    core/test/cornernet.py:12,164-166).

    dets: (N, 7) [x1, y1, x2, y2, score, tl_score, br_score] — the corner
    confidences weight the merge; a (N, 5) input gets unit corner scores.

    Per selection step (highest current score first) every still-alive box
    with positive intersection contributes its corners with weight
    ``(1 - decay)**weight_exp`` scaled by its tl/br corner score: x1,y1 are
    averaged under tl-score weights and x2,y2 under br-score weights, the
    selected box itself entering with weight 1. Boxes whose decayed score
    falls below ``threshold`` are dead: score 0, never selected, and no
    contribution to later merges (the Cython's compaction removal).

    Deliberate quirk fix vs the Cython: its in-place row swaps/compaction
    move columns 0:5 only, so after any reorder the tl/br weights come from
    whatever box ORIGINALLY occupied the row (nms.pyx soft_nms_merge swap
    block). Here corner scores stay attached to their boxes — the evident
    intent of the algorithm.
    """
    dets = jnp.asarray(dets, jnp.float32)
    n = dets.shape[0]
    if dets.shape[1] >= 7:
        tl_score, br_score = dets[:, 5], dets[:, 6]
    else:
        tl_score = br_score = jnp.ones((n,), jnp.float32)

    def body(_, state):
        boxes, scores, alive = state
        masked = jnp.where(alive, scores, -jnp.inf)
        i = jnp.argmax(masked)
        valid = masked[i] > -jnp.inf
        iou = bbox_overlaps(boxes[None, i, :4], boxes[:, :4])[0]
        if method == 1:
            weight = jnp.where(iou > Nt, 1.0 - iou, 1.0)
        elif method == 2:
            weight = jnp.exp(-(iou * iou) / sigma)
        else:
            weight = jnp.where(iou > Nt, 0.0, 1.0)
        weight = weight.at[i].set(1.0)

        # merge weights: (1 - decay)^exp over alive unselected boxes; zero
        # decay (no intersection) -> zero weight, exactly the skipped Cython
        # loop body. The selected box contributes itself with weight 1.
        mw = jnp.where(alive, (1.0 - weight) ** weight_exp, 0.0).at[i].set(1.0)
        # Guard the divide: a selected box with corner score 0 (7-col path)
        # makes mts/mbs exactly 0 — the Cython divides by the same zero, but
        # its NaN stays in one output row, whereas in this fori_loop it would
        # poison every later IoU. Clamp keeps that row finite (tl/br -> 0).
        mts = jnp.maximum(jnp.sum(tl_score * mw), 1e-12)
        mbs = jnp.maximum(jnp.sum(br_score * mw), 1e-12)
        merged_tl = jnp.sum(boxes[:, 0:2] * (tl_score * mw)[:, None], axis=0) / mts
        merged_br = jnp.sum(boxes[:, 2:4] * (br_score * mw)[:, None], axis=0) / mbs
        boxes = jnp.where(
            valid, boxes.at[i, 0:2].set(merged_tl).at[i, 2:4].set(merged_br), boxes
        )

        new_scores = jnp.where(alive & valid, scores * weight, scores)
        dead = new_scores < threshold
        new_scores = jnp.where(dead, 0.0, new_scores)
        alive = alive.at[i].set(False) & ~dead
        return boxes, new_scores, alive

    boxes, scores, _ = jax.lax.fori_loop(
        0, n, body, (dets, dets[:, 4], jnp.ones(n, bool))
    )
    return boxes.at[:, 4].set(scores)
