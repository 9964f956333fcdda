"""Dataset encoding: write sequence directories (the encode_bag core).

Reference scripts/encode_bag.py turns a rosbag into a sequence directory:
'camera_transform' (N, 4, 4) poses in data.hdf5 (encode_bag.py:123-126),
lossless frames.mp4 + a preview mp4 (encode_bag.py:39-57,128-136). Here the
writer is ROS-free (``SequenceWriter``); rosbag ingestion is a thin gated
layer in scripts/encode_bag.py that feeds it.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None
import h5py


class SequenceWriter:
    """Writes frames + poses (+ labels/calibration) in the reference's
    sequence-directory layout."""

    def __init__(self, out_dir: str, fps: float = 30.0, fourcc: str = "mp4v",
                 preview: bool = True):
        self.out_dir = str(out_dir)
        os.makedirs(self.out_dir, exist_ok=True)
        self.fps = fps
        self.fourcc = fourcc
        self.preview = preview
        self._writer = None
        self._preview_writer = None
        self._poses = []
        self._size = None

    def add_frame(self, image_rgb: np.ndarray, T_WC: np.ndarray):
        h, w = image_rgb.shape[:2]
        if self._writer is None:
            self._size = (w, h)
            code = cv2.VideoWriter_fourcc(*self.fourcc)
            self._writer = cv2.VideoWriter(
                os.path.join(self.out_dir, "frames.mp4"), code, self.fps, (w, h)
            )
            if self.preview:
                pw = min(1280, w)
                ph = int(round(h * pw / w))
                self._preview_size = (pw, ph)
                self._preview_writer = cv2.VideoWriter(
                    os.path.join(self.out_dir, "frames_preview.mp4"), code, self.fps,
                    self._preview_size,
                )
        assert (w, h) == self._size, "all frames must share one size"
        bgr = cv2.cvtColor(image_rgb, cv2.COLOR_RGB2BGR)
        self._writer.write(bgr)
        if self._preview_writer is not None:
            self._preview_writer.write(cv2.resize(bgr, self._preview_size))
        self._poses.append(np.asarray(T_WC, np.float64))

    def write_calibration(self, calibration_file: str):
        shutil.copy(calibration_file, os.path.join(self.out_dir, "calibration.yaml"))

    def write_keypoints(self, points_3d: np.ndarray):
        """keypoints.json in the labeler's format (scripts/label.py:24-30)."""
        with open(os.path.join(self.out_dir, "keypoints.json"), "wt") as f:
            json.dump({"3d_points": np.asarray(points_3d).tolist()}, f)

    def close(self):
        if self._writer is not None:
            self._writer.release()
        if self._preview_writer is not None:
            self._preview_writer.release()
        with h5py.File(os.path.join(self.out_dir, "data.hdf5"), "w") as f:
            f.create_dataset("camera_transform", data=np.stack(self._poses))

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
        return False
