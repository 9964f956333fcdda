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

__all__ = [
    "box_filter",
    "maxpool_nms",
    "extract_peaks",
    "assign_to_centers",
    "masked_kmeans",
    "resolve_capacity",
    "greedy_epipolar_match",
]
