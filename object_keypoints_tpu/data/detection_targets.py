"""CornerNet detection training targets: corner heatmaps + tag buffers.

Rebuild of the vendored COCO batch sampler's target math
(core/sample/cornernet.py:32-160, core/sample/utils.py:42-128): gaussian
corner bumps with the 3-case IoU-derived radius, sub-pixel offset targets,
flat tag indices and validity masks packed into fixed max_tag_len buffers —
exactly the layout training/losses.cornernet_loss consumes.

Host-side numpy (it runs in the input pipeline); the radius/gaussian pieces
are exposed separately because the keypoint side reuses them.
"""

from __future__ import annotations

import math
from typing import Sequence

import numpy as np

MAX_TAG_LEN = 128  # sample/cornernet.py:49


def gaussian_radius(det_size, min_overlap: float) -> float:
    """Least radius keeping IoU >= min_overlap under the 3 shift cases
    (sample/utils.py:65-86)."""
    height, width = det_size

    a1 = 1.0
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    r1 = (b1 - math.sqrt(b1 * b1 - 4 * a1 * c1)) / (2 * a1)

    a2 = 4.0
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    r2 = (b2 - math.sqrt(b2 * b2 - 4 * a2 * c2)) / (2 * a2)

    a3 = 4.0 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    r3 = (b3 + math.sqrt(b3 * b3 - 4 * a3 * c3)) / (2 * a3)
    return min(r1, r2, r3)


def gaussian_2d(shape, sigma: float = 1.0) -> np.ndarray:
    """(sample/utils.py:42-48)."""
    m, n = [(s - 1.0) / 2.0 for s in shape]
    y, x = np.ogrid[-m : m + 1, -n : n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_gaussian(heatmap: np.ndarray, center, radius: int, k: float = 1.0) -> None:
    """Max-composite a gaussian bump into a heatmap in place
    (sample/utils.py:50-63)."""
    diameter = 2 * radius + 1
    gaussian = gaussian_2d((diameter, diameter), sigma=diameter / 6)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    if right + left <= 0 or bottom + top <= 0:
        return
    masked_heatmap = heatmap[y - top : y + bottom, x - left : x + right]
    masked_gaussian = gaussian[radius - top : radius + bottom, radius - left : radius + right]
    np.maximum(masked_heatmap, masked_gaussian * k, out=masked_heatmap)


def render_corner_targets(
    detections: np.ndarray,
    categories: int,
    input_size: Sequence[int],
    output_size: Sequence[int],
    gaussian_bump: bool = True,
    gaussian_iou: float = 0.3,
    gaussian_rad: int = -1,
    max_tag_len: int = MAX_TAG_LEN,
):
    """Targets for one image (sample/cornernet.py:101-160).

    detections: (N, 5) [x1, y1, x2, y2, category(1-based)] in input pixels.
    Returns dict(tl_heatmaps/br_heatmaps (cat, oh, ow) NCHW-free —
    actually (oh, ow, cat) NHWC — tl_regrs/br_regrs (max_tag_len, 2),
    tl_tags/br_tags (max_tag_len,) flat output-pixel indices, tag_mask
    (max_tag_len,)).
    """
    oh, ow = output_size
    width_ratio = ow / input_size[1]
    height_ratio = oh / input_size[0]

    tl_heat = np.zeros((oh, ow, categories), np.float32)
    br_heat = np.zeros((oh, ow, categories), np.float32)
    tl_regrs = np.zeros((max_tag_len, 2), np.float32)
    br_regrs = np.zeros((max_tag_len, 2), np.float32)
    tl_tags = np.zeros((max_tag_len,), np.int64)
    br_tags = np.zeros((max_tag_len,), np.int64)
    tag_mask = np.zeros((max_tag_len,), bool)

    for ind, det in enumerate(detections[:max_tag_len]):
        category = int(det[-1]) - 1
        fxtl, fytl = det[0] * width_ratio, det[1] * height_ratio
        fxbr, fybr = det[2] * width_ratio, det[3] * height_ratio
        xtl, ytl, xbr, ybr = int(fxtl), int(fytl), int(fxbr), int(fybr)

        if gaussian_bump:
            width = det[2] - det[0]
            height = det[3] - det[1]
            width = math.ceil(width * width_ratio)
            height = math.ceil(height * height_ratio)
            if gaussian_rad == -1:
                radius = max(0, int(gaussian_radius((height, width), gaussian_iou)))
            else:
                radius = gaussian_rad
            draw_gaussian(tl_heat[..., category], (xtl, ytl), radius)
            draw_gaussian(br_heat[..., category], (xbr, ybr), radius)
        else:
            tl_heat[ytl, xtl, category] = 1.0
            br_heat[ybr, xbr, category] = 1.0

        tl_regrs[ind] = [fxtl - xtl, fytl - ytl]
        br_regrs[ind] = [fxbr - xbr, fybr - ybr]
        tl_tags[ind] = ytl * ow + xtl
        br_tags[ind] = ybr * ow + xbr
        tag_mask[ind] = True

    return {
        "tl_heatmaps": tl_heat,
        "br_heatmaps": br_heat,
        "tl_regrs": tl_regrs,
        "br_regrs": br_regrs,
        "tl_tags": tl_tags,
        "br_tags": br_tags,
        "tag_mask": tag_mask,
    }


def gather_tags(feat_nhwc, tags):
    """Gather per-tag features for the loss (_tranpose_and_gather_feat,
    py_utils/utils.py:21-25): (N, H, W, C), (N, M) flat indices -> (N, M, C)."""
    import jax.numpy as jnp

    n, h, w, c = feat_nhwc.shape
    flat = feat_nhwc.reshape(n, h * w, c)
    return jnp.take_along_axis(flat, tags[..., None].astype(jnp.int32), axis=1)
