"""CornerNet inference driver: multi-scale TTA + per-class soft-NMS.

Rebuild of corner_net_lite/core/test/cornernet.py:75-176
(cornernet_inference) and core/base.py:5-25 (the Base detector facade):
per test scale, resize + pad to `size | 127`, optional horizontal-flip TTA,
device decode (ops/detection_decode), rescale into original image
coordinates, per-class soft-NMS, cap at max_per_image. Device work (model
forward + corner decode) is one jitted call per padded-shape bucket; the
surrounding geometry is host numpy like the reference.
"""

from __future__ import annotations

from typing import Callable, Dict

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
import jax.numpy as jnp

from object_keypoints_tpu.ops import nms as nms_ops

# COCO normalization used by the vendored dbs (core/dbs/coco.py)
COCO_MEAN = np.array([0.40789654, 0.44719302, 0.47026115], np.float32)
COCO_STD = np.array([0.28863828, 0.27408164, 0.27809835], np.float32)

NMS_ALGORITHMS = {"nms": 0, "linear_soft_nms": 1, "exp_soft_nms": 2}


def crop_image(image, center, size):
    """Center-pad/crop to a fixed size (core/sample/utils.py crop_image).
    Returns (canvas, border, offset)."""
    cty, ctx = center
    height, width = size
    im_h, im_w = image.shape[:2]
    canvas = np.zeros((height, width, 3), dtype=image.dtype)

    x0, x1 = max(0, ctx - width // 2), min(ctx + width // 2, im_w)
    y0, y1 = max(0, cty - height // 2), min(cty + height // 2, im_h)

    left, right = ctx - x0, x1 - ctx
    top, bottom = cty - y0, y1 - cty

    cc_y, cc_x = height // 2, width // 2
    y_slice = slice(cc_y - top, cc_y + bottom)
    x_slice = slice(cc_x - left, cc_x + right)
    canvas[y_slice, x_slice] = image[y0:y1, x0:x1]

    border = np.array([cc_y - top, cc_y + bottom, cc_x - left, cc_x + right], np.float32)
    offset = np.array([cty - height // 2, ctx - width // 2])
    return canvas, border, offset


def rescale_detections(detections, ratios, borders, sizes):
    """Undo the resize/pad into original image coords
    (test/cornernet.py:14-21). In place."""
    xs, ys = detections[..., 0:4:2], detections[..., 1:4:2]
    xs /= ratios[:, 1][:, None, None]
    ys /= ratios[:, 0][:, None, None]
    xs -= borders[:, 2][:, None, None]
    ys -= borders[:, 0][:, None, None]
    np.clip(xs, 0, sizes[:, 1][:, None, None], out=xs)
    np.clip(ys, 0, sizes[:, 0][:, None, None], out=ys)
    return detections


def cornernet_inference(config, decode_fn: Callable, image: np.ndarray) -> Dict[int, np.ndarray]:
    """One image -> {category(1-based): (n, 5) [x1,y1,x2,y2,score]}.

    config: a DetectionConfig/dict (utils/config.py); decode_fn(images_nhwc)
    -> (B, num_dets, 8) detections (the jitted model test path).
    """
    K = config["top_k"]
    ae_threshold = config["ae_threshold"]
    nms_kernel = config["nms_kernel"]
    num_dets = config["num_dets"]
    test_flipped = config["test_flipped"]
    input_size = config["input_size"]
    output_size = config["output_sizes"][0]
    scales = config["test_scales"]
    weight_exp = config["weight_exp"]
    merge_bbox = config["merge_bbox"]
    categories = config["categories"]
    nms_threshold = config["nms_threshold"]
    max_per_image = config["max_per_image"]
    method = NMS_ALGORITHMS[config["nms_algorithm"]]

    height, width = image.shape[:2]
    height_scale = (input_size[0] + 1) // output_size[0]
    width_scale = (input_size[1] + 1) // output_size[1]

    all_dets = []
    for scale in scales:
        new_height = int(height * scale)
        new_width = int(width * scale)
        inp_height = new_height | 127
        inp_width = new_width | 127
        out_height = (inp_height + 1) // height_scale
        out_width = (inp_width + 1) // width_scale

        resized = cv2.resize(image, (new_width, new_height))
        padded, border, _ = crop_image(
            resized, (new_height // 2, new_width // 2), (inp_height, inp_width)
        )
        normalized = ((padded.astype(np.float32) / 255.0) - COCO_MEAN) / COCO_STD

        batch = normalized[None]
        if test_flipped:
            batch = np.concatenate([batch, batch[:, :, ::-1]], axis=0)

        dets = np.array(
            decode_fn(
                jnp.asarray(batch), K=K, ae_threshold=ae_threshold,
                kernel=nms_kernel, num_dets=num_dets,
            ),
            copy=True,  # device buffers are read-only; rescale edits in place
        )
        if test_flipped:
            dets[1, :, [0, 2]] = out_width - dets[1, :, [2, 0]]
            dets = dets.reshape(1, -1, 8)

        ratios = np.array([[out_height / inp_height, out_width / inp_width]], np.float32)
        borders = border[None]
        sizes = np.array([[new_height, new_width]], np.float32)
        rescale_detections(dets, ratios, borders, sizes)
        dets[:, :, 0:4] /= scale
        all_dets.append(dets)

    detections = np.concatenate(all_dets, axis=1)[0]
    classes = detections[:, -1]
    keep = detections[:, 4] > -1
    detections = detections[keep]
    classes = classes[keep]

    # Per-class soft-NMS as ONE device program (the reference loops the
    # Cython per class, core/test/cornernet.py:160-176 — one dispatch
    # round-trip per class on a tunneled chip). Classes pad to a shared
    # power-of-two bucket so the compiled shape is stable across images.
    per_class = [detections[classes == j][:, 0:7].astype(np.float32)
                 for j in range(categories)]
    n_max = max((len(d) for d in per_class), default=0)
    top_bboxes: Dict[int, np.ndarray] = {}
    if n_max:
        n_pad = 1 << max(4, (n_max - 1).bit_length())
        if merge_bbox:
            padded = nms_ops.pad_class_dets(per_class, n_pad, width=7)
            out = np.asarray(nms_ops.soft_nms_merge_batch(
                jnp.asarray(padded), Nt=nms_threshold, method=method,
                weight_exp=weight_exp))
        else:
            padded = nms_ops.pad_class_dets(
                [d[:, :5] for d in per_class], n_pad)
            out = np.asarray(nms_ops.soft_nms_batch(
                jnp.asarray(padded), Nt=nms_threshold, method=method))
        for j in range(categories):
            cls = out[j, : len(per_class[j])]
            cls = cls[cls[:, 4] > 0]
            top_bboxes[j + 1] = (cls[:, 0:5] if len(cls)
                                 else np.zeros((0, 5), np.float32))
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


class Detector:
    """Detector facade (core/base.py:5-25 + core/detectors.py): call with a
    BGR image, get {class name: (n, 5) boxes}."""

    def __init__(self, model, variables, config, class_names=None):
        import functools

        import jax

        self._model = model
        self._variables = variables
        self.config = config
        self.class_names = class_names or {
            i: str(i) for i in range(1, config["categories"] + 1)
        }

        # variables enter the jitted program as an ARGUMENT, not a closure:
        # closed-over weights are serialized into the program itself, which
        # both re-traces on weight swap and overflows the axon backend's
        # remote-compile request limit for the big detectors (HTTP 413 at
        # CornerNet_Saccade's ~116M params)
        @functools.partial(jax.jit, static_argnames=("K", "ae_threshold", "kernel", "num_dets"))
        def decode_fn(variables, images, K, ae_threshold, kernel, num_dets):
            out = model.apply(
                variables, images, False, True,
                K=K, ae_threshold=ae_threshold, kernel=kernel, num_dets=num_dets,
            )
            return out[0]

        self._decode_fn = functools.partial(decode_fn, variables)

    def __call__(self, image):
        by_id = cornernet_inference(self.config, self._decode_fn, image)
        return {self.class_names[j]: dets for j, dets in by_id.items()}
