"""CornerNet detection decoding: top-k corners -> paired boxes.

Device rebuild of corner_net_lite/core/models/py_utils/utils.py:4-129
(_gather_feat, _nms, _topk, _decode) in NHWC: sigmoid -> max-pool NMS ->
per-image top-K corners over classes*pixels -> sub-pixel offset refinement
-> all K x K tl/br pairings scored by mean heat, rejected on class
mismatch / tag distance / inverted geometry (and optionally border
corners) -> top num_dets detections.

Output matches the reference detections tensor layout (utils.py:119-129):
(batch, num_dets, 8) = [x1, y1, x2, y2, score, tl_score, br_score, class].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from object_keypoints_tpu.ops.decode import maxpool_nms


def topk_corners(scores_nhwc, k: int):
    """(N, H, W, C) -> per-image top-k over all class/pixel bins
    (utils.py:27-37). Returns (scores, inds, classes, ys, xs), each (N, k).
    The flat index enumerates (class, y, x) with class-major order like the
    reference's NCHW flatten."""
    n, h, w, c = scores_nhwc.shape
    nchw = jnp.transpose(scores_nhwc, (0, 3, 1, 2)).reshape(n, -1)
    scores, inds = jax.lax.top_k(nchw, k)
    classes = (inds // (h * w)).astype(jnp.int32)
    pix = inds % (h * w)
    ys = (pix // w).astype(jnp.float32)
    xs = (pix % w).astype(jnp.float32)
    return scores, pix, classes, ys, xs


def _gather_pixels(feat_nhwc, pix):
    """Gather (N, K, C) features at flat pixel indices (utils.py:4-25)."""
    n, h, w, c = feat_nhwc.shape
    flat = feat_nhwc.reshape(n, h * w, c)
    return jnp.take_along_axis(flat, pix[..., None].astype(jnp.int32), axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("K", "kernel", "ae_threshold", "num_dets", "no_border"),
)
def decode_detections(
    tl_heat, br_heat, tl_tag, br_tag, tl_regr, br_regr,
    K: int = 100, kernel: int = 1, ae_threshold: float = 1.0,
    num_dets: int = 1000, no_border: bool = False,
):
    """Full _decode (utils.py:39-129). Heads in NHWC: heats (N, H, W, C),
    tags (N, H, W, 1), offsets (N, H, W, 2)."""
    n, h, w, _ = tl_heat.shape
    tl_p = jax.nn.sigmoid(tl_heat.astype(jnp.float32))
    br_p = jax.nn.sigmoid(br_heat.astype(jnp.float32))
    if kernel > 1:
        tl_p = jnp.transpose(
            maxpool_nms(jnp.transpose(tl_p, (0, 3, 1, 2)), size=kernel), (0, 2, 3, 1)
        )
        br_p = jnp.transpose(
            maxpool_nms(jnp.transpose(br_p, (0, 3, 1, 2)), size=kernel), (0, 2, 3, 1)
        )

    tl_scores, tl_pix, tl_cls, tl_ys, tl_xs = topk_corners(tl_p, K)
    br_scores, br_pix, br_cls, br_ys, br_xs = topk_corners(br_p, K)

    tl_off = _gather_pixels(tl_regr.astype(jnp.float32), tl_pix)  # (N, K, 2)
    br_off = _gather_pixels(br_regr.astype(jnp.float32), br_pix)
    tl_xs = tl_xs + tl_off[..., 0]
    tl_ys = tl_ys + tl_off[..., 1]
    br_xs = br_xs + br_off[..., 0]
    br_ys = br_ys + br_off[..., 1]

    # K x K pairings
    txs = tl_xs[:, :, None]
    tys = tl_ys[:, :, None]
    bxs = br_xs[:, None, :]
    bys = br_ys[:, None, :]
    bboxes = jnp.stack(
        [jnp.broadcast_to(a, (n, K, K)) for a in (txs, tys, bxs, bys)], axis=3
    )

    tl_tag_k = _gather_pixels(tl_tag.astype(jnp.float32), tl_pix)[..., 0]
    br_tag_k = _gather_pixels(br_tag.astype(jnp.float32), br_pix)[..., 0]
    dists = jnp.abs(tl_tag_k[:, :, None] - br_tag_k[:, None, :])

    scores = (tl_scores[:, :, None] + br_scores[:, None, :]) / 2.0

    reject = (tl_cls[:, :, None] != br_cls[:, None, :])
    reject |= dists > ae_threshold
    reject |= bxs < txs
    reject |= bys < tys
    if no_border:
        raw_tys = tl_ys - tl_off[..., 1]
        raw_txs = tl_xs - tl_off[..., 0]
        raw_bys = br_ys - br_off[..., 1]
        raw_bxs = br_xs - br_off[..., 0]
        reject |= (raw_tys[:, :, None] == 0) | (raw_txs[:, :, None] == 0)
        reject |= (raw_bys[:, None, :] == h - 1) | (raw_bxs[:, None, :] == w - 1)
    scores = jnp.where(reject, -1.0, scores)

    flat_scores = scores.reshape(n, -1)
    top_scores, top_inds = jax.lax.top_k(flat_scores, num_dets)

    flat_boxes = bboxes.reshape(n, -1, 4)
    boxes = jnp.take_along_axis(flat_boxes, top_inds[..., None], axis=1)
    clses = jnp.take_along_axis(
        jnp.broadcast_to(tl_cls[:, :, None], (n, K, K)).reshape(n, -1), top_inds, axis=1
    ).astype(jnp.float32)
    tl_s = jnp.take_along_axis(
        jnp.broadcast_to(tl_scores[:, :, None], (n, K, K)).reshape(n, -1), top_inds, axis=1
    )
    br_s = jnp.take_along_axis(
        jnp.broadcast_to(br_scores[:, None, :], (n, K, K)).reshape(n, -1), top_inds, axis=1
    )
    return jnp.concatenate(
        [boxes, top_scores[..., None], tl_s[..., None], br_s[..., None],
         clses[..., None]], axis=2,
    )
