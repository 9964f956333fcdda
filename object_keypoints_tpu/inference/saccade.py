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

import functools
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


@functools.lru_cache(maxsize=16)
def _crop_all_fn(im_h: int, im_w: int, oh: int, ow: int):
    """The (unjitted) batched crop-zoom: jax function of
    (img (H,W,3) f32, centers (M,2) f32, sizes (M,2) f32) ->
    (canvases (M,oh,ow,3), offsets (M,2)). Shared by the standalone crop
    program and the fused crop+decode program."""
    import jax

    def crop_all(img, centers, sizes):
        def one(center, size):
            cty = center[0].astype(jnp.int32)
            ctx = center[1].astype(jnp.int32)
            height = size[0].astype(jnp.int32)
            width = size[1].astype(jnp.int32)
            scale = oh / jnp.maximum(jnp.maximum(height, width), 1).astype(jnp.float32)

            x0 = jnp.maximum(0, ctx - width // 2)
            x1 = jnp.minimum(ctx + width // 2, im_w)
            y0 = jnp.maximum(0, cty - height // 2)
            y1 = jnp.minimum(cty + height // 2, im_h)
            # destination rectangle (same int arithmetic as crop_zoom)
            oy0 = oh // 2 - ((cty - y0).astype(jnp.float32) * scale).astype(jnp.int32)
            oy1 = oh // 2 + ((y1 - cty).astype(jnp.float32) * scale).astype(jnp.int32)
            ox0 = ow // 2 - ((ctx - x0).astype(jnp.float32) * scale).astype(jnp.int32)
            ox1 = ow // 2 + ((x1 - ctx).astype(jnp.float32) * scale).astype(jnp.int32)

            # resample: canvas pixel (oy, ox) <- img(y0 + (oy-oy0)/sy, ...)
            # with the cv2.resize pixel-center convention
            sy = (y1 - y0).astype(jnp.float32) / jnp.maximum(oy1 - oy0, 1)
            sx = (x1 - x0).astype(jnp.float32) / jnp.maximum(ox1 - ox0, 1)
            oys = jnp.arange(oh, dtype=jnp.float32)
            oxs = jnp.arange(ow, dtype=jnp.float32)
            src_y = (oys - oy0 + 0.5) * sy - 0.5 + y0
            src_x = (oxs - ox0 + 0.5) * sx - 0.5 + x0

            def sample_axis(coords, lo, hi):
                # replicate-clamp at the PATCH border like cv2.resize
                c = jnp.clip(coords, lo.astype(jnp.float32),
                             hi.astype(jnp.float32) - 1.001)
                i0 = jnp.floor(c).astype(jnp.int32)
                frac = c - i0
                return i0, frac

            yi, yf = sample_axis(src_y, y0, y1)
            xi, xf = sample_axis(src_x, x0, x1)
            g00 = img[yi][:, xi]
            g01 = img[yi][:, jnp.minimum(xi + 1, im_w - 1)]
            g10 = img[jnp.minimum(yi + 1, im_h - 1)][:, xi]
            g11 = img[jnp.minimum(yi + 1, im_h - 1)][:, jnp.minimum(xi + 1, im_w - 1)]
            interp = (
                g00 * ((1 - yf)[:, None, None] * (1 - xf)[None, :, None])
                + g01 * ((1 - yf)[:, None, None] * xf[None, :, None])
                + g10 * (yf[:, None, None] * (1 - xf)[None, :, None])
                + g11 * (yf[:, None, None] * xf[None, :, None])
            )
            inside = (
                (jnp.arange(oh)[:, None] >= oy0)
                & (jnp.arange(oh)[:, None] < oy1)
                & (jnp.arange(ow)[None, :] >= ox0)
                & (jnp.arange(ow)[None, :] < ox1)
            )
            canvas = jnp.where(inside[..., None], interp, 0.0)
            offset = jnp.stack(
                [(cty - height // 2).astype(jnp.float32),
                 (ctx - width // 2).astype(jnp.float32)]
            )
            return canvas, offset

        return jax.vmap(one)(centers, sizes)

    return crop_all


@functools.lru_cache(maxsize=16)
def _crop_zoom_program(im_h: int, im_w: int, oh: int, ow: int):
    """One compiled crop-zoom program per (image shape, out size) —
    module-level cache so repeated `_prepare_images` calls reuse the same
    jitted program instead of retracing a fresh closure every invocation
    (round-2 advisor finding); the M (crop-count) axis is padded to a fixed
    capacity by the caller, so the shapes — and therefore the compile — are
    stable across the whole saccade loop."""
    import jax

    return jax.jit(_crop_all_fn(im_h, im_w, oh, ow))


def _device_crop_zoom_batch(image, centers_yx, crop_sizes_hw, out_size):
    """Batched crop-zoom as ONE jitted program (TPU-first replacement for
    the reference's per-crop GPU interpolates, cornernet_saccade.py:15-39).

    image: (H, W, 3) f32; centers_yx: (M, 2); crop_sizes_hw: (M, 2) float.
    Returns (canvases (M, oh, ow, 3), offsets (M, 2)). Same geometry as
    :func:`crop_zoom` (int-truncated window edges, zero padding outside the
    image); the bilinear resample matches cv2's INTER_LINEAR up to boundary
    convention (gated in tests/test_saccade.py).
    """
    oh, ow = out_size
    im_h, im_w = image.shape[:2]
    crop_all = _crop_zoom_program(im_h, im_w, oh, ow)
    return crop_all(
        jnp.asarray(image, jnp.float32),
        jnp.asarray(centers_yx, jnp.float32),
        jnp.asarray(crop_sizes_hw, jnp.float32),
    )


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


def _prepare_images(config, image, locations, device_crops: bool = True):
    """(cornernet_saccade.py:223-233). With ``device_crops`` (the default;
    the reference also crops on-device, cornernet_saccade.py:15-39) the
    whole crop batch runs as one jitted program padded to att_max_crops
    (static shape, one compile) instead of per-crop host cv2 resizes."""
    input_size = config["input_size"]
    if device_crops and len(locations):
        unit = max(int(config["att_max_crops"]), 1)
        # fixed capacity: one compiled shape for the whole saccade loop
        # (locations never exceed att_max_crops in the driver; round up in
        # `unit` steps for direct callers that pass more)
        cap = unit * max(1, -(-len(locations) // unit))
        padded = np.ones((cap, 3), np.float32)
        padded[: len(locations)] = locations[:, :3]
        sizes = np.stack(
            [np.floor(input_size[0] / padded[:, 2]),
             np.floor(input_size[1] / padded[:, 2])], axis=1
        ).astype(np.float32)
        canvases, offsets = _device_crop_zoom_batch(
            image, padded[:, :2], sizes, tuple(input_size)
        )
        m = len(locations)
        return np.asarray(canvases[:m]), np.asarray(offsets[:m])
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


def make_saccade_decode_fn(model, variables, config):
    """The jitted ``decode_fn`` for :func:`cornernet_saccade_inference`
    over a real CornerNet_Saccade flax model.

    In test mode the attention model ALWAYS returns
    ``((detections, tl_heat, br_heat, tl_tag, br_tag), atts)``
    (models/cornernet.py test path), so both branches unpack the inner
    tuple; ``no_att`` (the final iteration, which never decodes attention)
    only drops the attention maps from the return so the host skips their
    transfer — mirroring the reference's no_att flag
    (cornernet_saccade.py:249-263).

    The attention max-pool NMS (cornernet_saccade.py:49-55) is FUSED into
    this program (one maxpool per att scale) so the driver skips three
    separate dispatch round-trips per iteration; the returned callable
    advertises it with ``att_nms_fused = True`` and
    :func:`cornernet_saccade_inference` then consumes the maps as
    already-suppressed."""
    import jax

    att_nms_ks = tuple(config["att_nms_ks"])

    # variables are a jit ARGUMENT, not a closure constant: closed-over
    # weights get serialized into the program shipped to the compiler,
    # which overflows the axon remote-compile request limit at
    # CornerNet_Saccade's param count (HTTP 413) and would re-trace on
    # every weight swap.
    @functools.partial(jax.jit, static_argnames=("no_att",))
    def _decode(variables, images, no_att):
        (dets, *_), atts = model.apply(
            variables, images, False, True,
            K=config["top_k"], ae_threshold=config["ae_threshold"],
            kernel=config["nms_kernel"], num_dets=config["num_dets"],
            no_border=True,
        )
        if no_att:
            return dets, None
        atts = [
            jnp.transpose(
                maxpool_nms(jnp.transpose(att, (0, 3, 1, 2)), size=k),
                (0, 2, 3, 1),
            )
            for att, k in zip(atts, att_nms_ks)
        ]
        return dets, atts

    fn = functools.partial(_decode, variables)
    fn.att_nms_fused = True
    return fn


def make_saccade_decode_fn_fused(model, variables, config):
    """Crop+forward+decode as ONE jitted program (TPU-first tightening of
    :func:`make_saccade_decode_fn`): the full image is uploaded to HBM once
    per image; each saccade iteration ships only the (M, 3) location batch
    up and the decoded detections/attention peaks back.

    Measured motivation: the split pipeline round-trips every crop batch
    device->host->device (~3 MB each way per iteration over the tunneled
    chip) and retraces the model per distinct crop count. Here the M axis
    is padded by the DRIVER to a power-of-two bucket (static shape per
    bucket, pad rows decoded and discarded — batch rows are independent in
    test mode: no dropout, frozen BN), normalization runs in-program from
    the raw uint8 frame, and the crop resample is the same
    :func:`_crop_all_fn` geometry as the standalone program.

    Returns ``fn(image, centers, sizes, no_att) -> (dets, atts, offsets)``
    with ``crop_fused = att_nms_fused = True``;
    :func:`cornernet_saccade_inference` switches its loop accordingly.
    Reference: cornernet_saccade.py:15-39 (GPU crops), :223-263 (loop).
    """
    import jax

    att_nms_ks = tuple(config["att_nms_ks"])
    input_size = tuple(config["input_size"])
    mean = jnp.asarray(COCO_MEAN, jnp.float32)
    std = jnp.asarray(COCO_STD, jnp.float32)

    @functools.partial(jax.jit, static_argnames=("no_att",))
    def _decode_crops(variables, image, centers, sizes, no_att):
        img = (image.astype(jnp.float32) / 255.0 - mean) / std
        crop_all = _crop_all_fn(img.shape[0], img.shape[1], *input_size)
        canvases, offsets = crop_all(img, centers, sizes)
        (dets, *_), atts = model.apply(
            variables, canvases, False, True,
            K=config["top_k"], ae_threshold=config["ae_threshold"],
            kernel=config["nms_kernel"], num_dets=config["num_dets"],
            no_border=True,
        )
        if no_att:
            return dets, None, offsets
        atts = [
            jnp.transpose(
                maxpool_nms(jnp.transpose(att, (0, 3, 1, 2)), size=k),
                (0, 2, 3, 1),
            )
            for att, k in zip(atts, att_nms_ks)
        ]
        return dets, atts, offsets

    fn = functools.partial(_decode_crops, variables)
    fn.att_nms_fused = True
    fn.crop_fused = True
    return fn


def cornernet_saccade_inference(config, decode_fn, image,
                                device_crops: bool = True) -> Dict[int, np.ndarray]:
    """Full two-stage saccade inference (cornernet_saccade.py:300-400).

    decode_fn(images_nhwc, no_att) -> (detections (B, num_dets, 8),
    atts: list of (B, h, w, 1) sigmoided attention maps or None).
    ``device_crops`` (default on, matching the reference's on-device crops):
    batch the zoom crops as one jitted device program with fixed
    att_max_crops capacity instead of per-crop host resizes.
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
    att_fused = getattr(decode_fn, "att_nms_fused", False)
    crop_fused = getattr(decode_fn, "crop_fused", False)
    if crop_fused:
        # one upload of the raw frame per image; every stage afterwards
        # ships only an (M, 2)+(M, 2) location batch up and detections back
        img_dev = jnp.asarray(image)
        input_size = config["input_size"]
        norm = None
    else:
        norm = ((image.astype(np.float32) / 255.0) - COCO_MEAN) / COCO_STD

    def run_stage(locations, no_att):
        """One decode pass; returns (dets (M*num_dets rows pending reshape),
        atts list | None, offsets (M, 2)) with pad rows already dropped."""
        if crop_fused:
            m = len(locations)
            cap = 1 << max(0, int(m - 1).bit_length())  # pow2 bucket >= m
            padded = np.ones((cap, 3), np.float32)
            padded[:m] = locations[:, :3]
            sizes = np.stack(
                [np.floor(input_size[0] / padded[:, 2]),
                 np.floor(input_size[1] / padded[:, 2])], axis=1
            ).astype(np.float32)
            dets, atts, offsets = decode_fn(
                img_dev, jnp.asarray(padded[:, :2]), jnp.asarray(sizes), no_att
            )
            dets = np.array(dets[:m], copy=True)
            offsets = np.asarray(offsets[:m])
            if atts is not None:
                atts = [np.asarray(a[:m]) for a in atts]
            return dets, atts, offsets
        images, offsets = _prepare_images(config, norm, locations,
                                          device_crops=device_crops)
        dets, atts = decode_fn(jnp.asarray(images), no_att)
        dets = np.array(dets, copy=True)
        if atts is not None:
            atts = ([np.asarray(a) for a in atts] if att_fused
                    else att_nms(atts, att_nms_ks))
        return dets, atts, offsets

    # stage 1: downsized full views
    locations = np.array(
        [[height // 2, width // 2, s / max(height, width)] for s in init_sizes],
        np.float32,
    )
    dets, atts, offsets = run_stage(locations, False)

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

        dets, atts, offsets = run_stage(locations, no_att)
        _rescale_remap(config, dets, locations[:, 2], offsets)
        dets = dets.reshape(-1, 8)
        dets = dets[dets[:, 4] > -1]
        all_dets.append(dets)

        if num_crops >= att_max_crops or ind >= num_iterations:
            break
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
    # Per-class soft-NMS as ONE device program (the reference loops the
    # Cython per class, cornernet_saccade.py:383-391 — one tunnel dispatch
    # per class here would dominate the whole drive). Pad every class to a
    # power-of-two bucket so the compiled shape is stable across images.
    per_class = [detections[classes == j][:, 0:5].astype(np.float32)
                 for j in range(categories)]
    n_max = max((len(d) for d in per_class), default=0)
    top_bboxes = {}
    if n_max:
        n_pad = 1 << max(4, (n_max - 1).bit_length())
        padded = nms_ops.pad_class_dets(per_class, n_pad)
        out = np.asarray(nms_ops.soft_nms_batch(
            jnp.asarray(padded), Nt=nms_threshold, method=method, sigma=0.7))
        for j in range(categories):
            cls = out[j, : len(per_class[j])]
            cls = cls[cls[:, 4] > 0]
            top_bboxes[j + 1] = cls if len(cls) else np.zeros((0, 5), np.float32)
    else:
        for j in range(categories):
            top_bboxes[j + 1] = np.zeros((0, 5), np.float32)

    scores = np.hstack([top_bboxes[j][:, -1] for j in range(1, categories + 1)])
    if len(scores) > max_per_image:
        kth = len(scores) - max_per_image
        thresh = np.partition(scores, kth)[kth]
        for j in range(1, categories + 1):
            top_bboxes[j] = top_bboxes[j][top_bboxes[j][:, -1] >= thresh]
    return top_bboxes
