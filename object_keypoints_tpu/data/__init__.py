"""Data pipeline: target rendering, datasets, augmentation, prefetch."""

from object_keypoints_tpu.data import targets  # noqa: F401
