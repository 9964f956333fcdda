"""Shared constants (reference: perception/constants.py:9-14, minus the
`hud` GUI dependency — IMAGE_RECT becomes a plain tuple rect)."""

from collections import namedtuple

import numpy as np

Rect = namedtuple("Rect", ["x", "y", "width", "height"])

KEYPOINT_FILENAME = "keypoints.json"

# ImageNet-ish normalization constants from the reference (video.py:55-56).
# Live here (not data/scene.py) so the device-side normalizer in
# training/trainer.py can import them without pulling in cv2/h5py.
RGB_MEAN = np.array([0.40789654, 0.44719302, 0.47026115], dtype=np.float32)
RGB_STD = np.array([0.28863828, 0.27408164, 0.27809835], dtype=np.float32)

IMAGE_HEIGHT = 720
IMAGE_WIDTH = 1280
IMAGE_RECT = Rect(0, 0, IMAGE_WIDTH, IMAGE_HEIGHT)
image_size = (IMAGE_WIDTH, IMAGE_HEIGHT)
KEYPOINT_COLOR = np.array([1.0, 0.0, 0.0, 1.0])
