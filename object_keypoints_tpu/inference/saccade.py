"""CornerNet-Saccade two-stage inference: attention pass -> zoom-in crops.

Rebuild of corner_net_lite/core/test/cornernet_saccade.py:15-400. Stage 1
runs downsized views ("init sizes") through the attention heads; attention
peaks above threshold become zoom-in locations (plus refined locations from
confident stage-1 detections). Stage 2 crops those locations at their
predicted scales, batch-decodes them, and iterates up to ``att_max_crops``
crops. Final boxes get per-class soft-NMS + a max_per_image cap.

The model forward + corner decode is one jitted call per batch; crop/resize
and the location bookkeeping are host numpy, like the reference (its crops
run as individual GPU interpolates, cornernet_saccade.py:15-39).
"""

from __future__ import annotations

from typing import Dict

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
import jax.numpy as jnp

from object_keypoints_tpu.inference.detector import COCO_MEAN, COCO_STD, NMS_ALGORITHMS
from object_keypoints_tpu.ops import nms as nms_ops
from object_keypoints_tpu.ops.decode import maxpool_nms


def crop_zoom(image, center, size, out_size):
    """Crop a (size) window at center and scale it into an out_size canvas
    (crop_image_gpu, cornernet_saccade.py:15-39). image: (H, W, 3) float.
    Returns (canvas, offset)."""
    cty, ctx = int(center[0]), int(center[1])
    height, width = size
    o_height, o_width = out_size
    im_h, im_w = image.shape[:2]
    scale = o_height / max(height, width)

    x0, x1 = max(0, ctx - width // 2), min(ctx + width // 2, im_w)
    y0, y1 = max(0, cty - height // 2), min(cty + height // 2, im_h)
    left, right = ctx - x0, x1 - ctx
    top, bottom = cty - y0, y1 - cty

    cc_y, cc_x = o_height // 2, o_width // 2
    oy0, oy1 = cc_y - int(top * scale), cc_y + int(bottom * scale)
    ox0, ox1 = cc_x - int(left * scale), cc_x + int(right * scale)

    canvas = np.zeros((o_height, o_width, 3), np.float32)
    patch = image[y0:y1, x0:x1]
    if patch.size and (oy1 - oy0) > 0 and (ox1 - ox0) > 0:
        canvas[oy0:oy1, ox0:ox1] = cv2.resize(
            patch, (ox1 - ox0, oy1 - oy0), interpolation=cv2.INTER_LINEAR
        )
    return canvas, np.array([cty - height // 2, ctx - width // 2], np.float32)


def att_nms(atts, kernel_sizes):
    """Max-pool NMS per attention map (cornernet_saccade.py:49-55).
    atts: list of (N, h, w, 1) NHWC maps."""
    out = []
    for att, k in zip(atts, kernel_sizes):
        nchw = jnp.transpose(att, (0, 3, 1, 2))
        out.append(np.asarray(jnp.transpose(maxpool_nms(nchw, size=k), (0, 2, 3, 1))))
    return out


def decode_atts(config, atts, att_scales, scales, offsets, height, width,
                thresh, ignore_same=False):
    """Attention peaks -> next zoom locations (cornernet_saccade.py:100-133).
    Returns (M, 4) [y, x, scale, score]."""
    att_ratios = config["att_ratios"]
    att_scales = np.atleast_1d(np.asarray(att_scales, np.float32))
    ys_out, xs_out, scales_out, scores_out = [], [], [], []
    num_views = atts[0].shape[0]
    for aind in range(num_views):
        for att, att_ratio, att_scale in zip(atts, att_ratios, att_scales):
            ys, xs = np.where(att[aind, :, :, 0] > thresh)
            scores = att[aind, ys, xs, 0]
            ys = ys * att_ratio / scales[aind] + offsets[aind, 0]
            xs = xs * att_ratio / scales[aind] + offsets[aind, 1]
            keep = (ys >= 0) & (ys < height) & (xs >= 0) & (xs < width)
            ys, xs, scores = ys[keep], xs[keep], scores[keep]
            next_scale = att_scale * scales[aind]
            if (ignore_same and att_scale <= 1) or scales[aind] > 2 or next_scale > 4:
                continue
            scales_out += [next_scale] * len(xs)
            scores_out += scores.tolist()
            ys_out += ys.tolist()
            xs_out += xs.tolist()
    if not ys_out:
        return np.zeros((0, 4), np.float32)
    return np.stack(
        [np.array(ys_out), np.array(xs_out), np.array(scales_out), np.array(scores_out)],
        axis=1,
    ).astype(np.float32)


def get_ref_locs(dets):
    """Zoom locations from confident detections
    (cornernet_saccade.py:135-156)."""
    dets = dets[dets[:, 4] > 0.5]
    if not len(dets):
        return np.zeros((0, 4), np.float32)
    ref_xs = (dets[:, 0] + dets[:, 2]) / 2
    ref_ys = (dets[:, 1] + dets[:, 3]) / 2
    maxhw = np.maximum(dets[:, 2] - dets[:, 0], dets[:, 3] - dets[:, 1])
    ref_scales = np.zeros_like(maxhw)
    ref_scales[maxhw > 96] = 192 / maxhw[maxhw > 96]
    ref_scales[(maxhw > 32) & (maxhw <= 96)] = 64 / maxhw[(maxhw > 32) & (maxhw <= 96)]
    ref_scales[maxhw <= 32] = 24 / maxhw[maxhw <= 32]
    out = np.stack([ref_ys, ref_xs, ref_scales, np.ones_like(maxhw)], axis=1)
    return out.astype(np.float32)


def location_nms(locations, thresh=15):
    """Greedy suppression of nearby same-scale zoom locations
    (cornernet_saccade.py:192-221)."""
    if not len(locations):
        return np.zeros((0, 4), np.float32)
    order = np.argsort(locations[:, -1])[::-1]
    locations = locations[order]
    kept = []
    while len(locations):
        kept.append(locations[0])
        scale = locations[0, 2]
        dist = np.minimum(
            np.abs(locations[0, 0] - locations[:, 0]),
            np.abs(locations[0, 1] - locations[:, 1]),
        )
        ratio = locations[0, 2] / locations[:, 2]
        keep = (dist > (thresh / scale)) | (ratio > 1.2) | (ratio < 0.8)
        locations = locations[keep]
    return np.stack(kept)


def _prepare_images(config, image, locations):
    """(cornernet_saccade.py:223-233)."""
    input_size = config["input_size"]
    images = np.zeros((len(locations), input_size[0], input_size[1], 3), np.float32)
    offsets = np.zeros((len(locations), 2), np.float32)
    for ind, (y, x, scale) in enumerate(locations[:, :3]):
        crop_h = int(input_size[0] / scale)
        crop_w = int(input_size[1] / scale)
        images[ind], offsets[ind] = crop_zoom(image, (y, x), (crop_h, crop_w), input_size)
    return images, offsets


def _rescale_remap(config, dets, scales, offsets):
    input_size = config["input_size"]
    output_size = config["output_sizes"][0]
    dets[..., 0:4:2] /= output_size[1] / input_size[1]
    dets[..., 1:4:2] /= output_size[0] / input_size[0]
    xs, ys = dets[..., 0:4:2], dets[..., 1:4:2]
    xs /= scales.reshape(-1, 1, 1)
    ys /= scales.reshape(-1, 1, 1)
    xs += offsets[:, 1][:, None, None]
    ys += offsets[:, 0][:, None, None]


def cornernet_saccade_inference(config, decode_fn, image) -> Dict[int, np.ndarray]:
    """Full two-stage saccade inference (cornernet_saccade.py:300-400).

    decode_fn(images_nhwc, no_att) -> (detections (B, num_dets, 8),
    atts: list of (B, h, w, 1) sigmoided attention maps or None).
    """
    init_sizes = config["init_sizes"]
    ref_dets = config["ref_dets"]
    att_thresholds = config["att_thresholds"]
    att_scales = config["att_scales"]
    att_max_crops = config["att_max_crops"]
    att_nms_ks = config["att_nms_ks"]
    categories = config["categories"]
    nms_threshold = config["nms_threshold"]
    max_per_image = config["max_per_image"]
    method = NMS_ALGORITHMS[config["nms_algorithm"]]
    num_iterations = len(att_thresholds)

    height, width = image.shape[:2]
    norm = ((image.astype(np.float32) / 255.0) - COCO_MEAN) / COCO_STD

    # stage 1: downsized full views
    locations = np.array(
        [[height // 2, width // 2, s / max(height, width)] for s in init_sizes],
        np.float32,
    )
    images, offsets = _prepare_images(config, norm, locations)
    dets, atts = decode_fn(jnp.asarray(images), False)
    dets = np.array(dets, copy=True)
    atts = att_nms(atts, att_nms_ks)

    scales = locations[:, 2]
    next_locations = decode_atts(
        config, atts, att_scales[0], scales, offsets, height, width, att_thresholds[0]
    )
    _rescale_remap(config, dets, scales, offsets)
    dets = dets.reshape(-1, 8)
    dets = dets[dets[:, 4] > 0.3]
    if ref_dets:
        next_locations = np.concatenate([next_locations, get_ref_locs(dets)], axis=0)
        next_locations = location_nms(next_locations, thresh=16)

    all_dets = [dets]
    locations = next_locations
    num_crops = 0
    for ind in range(1, num_iterations + 1):
        if not len(locations):
            break
        if num_crops + len(locations) > att_max_crops:
            locations = locations[: att_max_crops - num_crops]
        num_crops += len(locations)
        no_att = ind == num_iterations

        images, offsets = _prepare_images(config, norm, locations)
        dets, atts = decode_fn(jnp.asarray(images), no_att)
        dets = np.array(dets, copy=True)
        _rescale_remap(config, dets, locations[:, 2], offsets)
        dets = dets.reshape(-1, 8)
        dets = dets[dets[:, 4] > -1]
        all_dets.append(dets)

        if num_crops >= att_max_crops or ind >= num_iterations:
            break
        atts = att_nms(atts, att_nms_ks)
        next_locations = decode_atts(
            config, atts, att_scales[ind], locations[:, 2], offsets,
            height, width, att_thresholds[ind], ignore_same=True,
        )
        if ref_dets:
            next_locations = np.concatenate([next_locations, get_ref_locs(dets)], axis=0)
            next_locations = location_nms(next_locations, thresh=16)
        locations = next_locations

    detections = np.concatenate(all_dets, axis=0)
    classes = detections[:, -1]
    top_bboxes = {}
    for j in range(categories):
        cls_dets = detections[classes == j][:, 0:5].astype(np.float32)
        if len(cls_dets):
            out = np.asarray(
                nms_ops.soft_nms(jnp.asarray(cls_dets), Nt=nms_threshold,
                                 method=method, sigma=0.7)
            )
            cls_dets = out[out[:, 4] > 0]
        top_bboxes[j + 1] = cls_dets if len(cls_dets) else np.zeros((0, 5), np.float32)

    scores = np.hstack([top_bboxes[j][:, -1] for j in range(1, categories + 1)])
    if len(scores) > max_per_image:
        kth = len(scores) - max_per_image
        thresh = np.partition(scores, kth)[kth]
        for j in range(1, categories + 1):
            top_bboxes[j] = top_bboxes[j][top_bboxes[j][:, -1] >= thresh]
    return top_bboxes
