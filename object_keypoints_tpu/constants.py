"""Shared constants (reference: perception/constants.py:9-14, minus the
`hud` GUI dependency — IMAGE_RECT becomes a plain tuple rect)."""

from collections import namedtuple

import numpy as np

Rect = namedtuple("Rect", ["x", "y", "width", "height"])

KEYPOINT_FILENAME = "keypoints.json"
IMAGE_HEIGHT = 720
IMAGE_WIDTH = 1280
IMAGE_RECT = Rect(0, 0, IMAGE_WIDTH, IMAGE_HEIGHT)
image_size = (IMAGE_WIDTH, IMAGE_HEIGHT)
KEYPOINT_COLOR = np.array([1.0, 0.0, 0.0, 1.0])
