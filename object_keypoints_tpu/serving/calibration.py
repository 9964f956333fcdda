"""Real-frame collection for int8 activation calibration.

One implementation of "read frames back through SceneDataset
(normalization + 511 resize) for calibration", shared by the production
packaging CLI (scripts/package_model.py) and the throughput benchmark
(bench.py) — so what the benchmark measures is the packaging path by
construction, and changes to it (frame counts, normalization, percentile
handling upstream) reach both. Mirrors the reference's practice of
calibrating/serving on dataset frames rather than noise
(scripts/package_model.py docstring cites the checkpoint data dirs).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np


def collect_calibration_frames(data_dirs: Sequence[Optional[str]],
                               keypoint_config: Sequence[int],
                               n_frames: int = 16) -> Optional[List[np.ndarray]]:
    """Up to ``n_frames`` normalized frames from the first reachable
    directory-of-sequences in ``data_dirs``; None when none is readable."""
    from object_keypoints_tpu.data.scene import SceneDataset

    frames: List[np.ndarray] = []
    for data_dir in data_dirs:
        if not data_dir or not os.path.isdir(data_dir):
            continue
        seqs = sorted(
            os.path.join(data_dir, d)
            for d in os.listdir(data_dir)
            if os.path.isdir(os.path.join(data_dir, d))
        )
        for seq in seqs:
            try:
                dataset = SceneDataset(
                    seq, {"keypoint_config": list(keypoint_config)}, augment=False
                )
            except (OSError, AssertionError):
                continue  # not an encoded sequence / wrong topology
            for example in dataset:
                frames.append(np.asarray(example["frame"], np.float32))
                if len(frames) >= n_frames:
                    break
            if len(frames) >= n_frames:
                break
        if frames:
            break
    return frames or None


def calibration_batches(frames: Sequence[np.ndarray], batch: int = 4):
    """Stack frames into the small batches calibrate_activation_scales eats."""
    return [np.stack(frames[i : i + batch]) for i in range(0, len(frames), batch)]
