"""Detection inference drivers + detector facades."""

from object_keypoints_tpu.inference.detector import (
    Detector,
    cornernet_inference,
    crop_image,
    rescale_detections,
)

__all__ = ["Detector", "cornernet_inference", "crop_image", "rescale_detections"]
