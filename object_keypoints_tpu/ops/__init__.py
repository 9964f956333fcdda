"""Device-side ops: heatmap decode, association primitives, pooling, NMS."""

from object_keypoints_tpu.ops.decode import (
    box_filter,
    maxpool_nms,
    extract_peaks,
)
from object_keypoints_tpu.ops.associate import (
    assign_to_centers,
    masked_kmeans,
    resolve_capacity,
    greedy_epipolar_match,
)
from object_keypoints_tpu.ops.corner_pool import (
    top_pool,
    bottom_pool,
    left_pool,
    right_pool,
    TopPool,
    BottomPool,
    LeftPool,
    RightPool,
)
from object_keypoints_tpu.ops.nms import (
    bbox_overlaps,
    nms_mask,
    soft_nms,
    soft_nms_merge,
)
from object_keypoints_tpu.ops.detection_decode import decode_detections, topk_corners

__all__ = [
    "box_filter",
    "maxpool_nms",
    "extract_peaks",
    "assign_to_centers",
    "masked_kmeans",
    "resolve_capacity",
    "greedy_epipolar_match",
    "top_pool",
    "bottom_pool",
    "left_pool",
    "right_pool",
    "TopPool",
    "BottomPool",
    "LeftPool",
    "RightPool",
    "bbox_overlaps",
    "nms_mask",
    "soft_nms",
    "soft_nms_merge",
    "decode_detections",
    "topk_corners",
]
