"""Config system: SystemConfig + detection db defaults + JSON merge.

Parity with corner_net_lite/core/config.py:4-162 (dict-backed SystemConfig
with property accessors and update_config merge) and core/dbs/
detection.py:5-70 (the de-facto default registry for detection: sizes,
top_k, ae/nms thresholds, saccade attention parameters). Model JSONs pair a
"system" and a "db" section (configs/*.json) exactly like the reference's
configs directory.
"""

from __future__ import annotations

import json
import os

import numpy as np


class SystemConfig:
    """Training-system configuration (core/config.py:4-162)."""

    def __init__(self, **overrides):
        self._configs = {
            "dataset": None,
            "sampling_function": "cornernet",
            # training
            "display": 5,
            "snapshot": 400,
            "stepsize": 5000,
            "learning_rate": 0.001,
            "decay_rate": 10,
            "max_iter": 100000,
            "val_iter": 20,
            "batch_size": 1,
            "snapshot_name": None,
            "prefetch_size": 100,
            "pretrain": None,
            "opt_algo": "adam",
            "chunk_sizes": None,  # kept for parity; SPMD needs no chunks
            # directories
            "data_dir": "./data",
            "cache_dir": "./cache",
            "config_dir": "./config",
            "result_dir": "./results",
            # splits
            "train_split": "training",
            "val_split": "validation",
            "test_split": "testdev",
            # rngs
            "data_rng": np.random.RandomState(123),
            "nnet_rng": np.random.RandomState(317),
        }
        self.update_config(overrides)

    def __getattr__(self, name):
        configs = object.__getattribute__(self, "_configs")
        if name in configs:
            return configs[name]
        raise AttributeError(name)

    @property
    def full(self):
        return self._configs

    def update_config(self, new: dict):
        for key, value in (new or {}).items():
            if key in self._configs:
                self._configs[key] = value
        return self

    @property
    def snapshot_dir(self):
        return os.path.join(self._configs["cache_dir"], "nnet",
                            self._configs["snapshot_name"] or "model")

    @property
    def snapshot_file(self):
        return os.path.join(self.snapshot_dir, (self._configs["snapshot_name"] or "model")
                            + "_{}.ckpt")


DETECTION_DEFAULTS = {
    # training (core/dbs/detection.py:9-62)
    "categories": 80,
    "rand_scales": [1],
    "rand_scale_min": 0.8,
    "rand_scale_max": 1.4,
    "rand_scale_step": 0.2,
    # train + test
    "input_size": [383, 383],
    "output_sizes": [[96, 96], [48, 48], [24, 24], [12, 12]],
    "score_threshold": 0.05,
    "nms_threshold": 0.7,
    "max_per_set": 40,
    "max_per_image": 100,
    "top_k": 20,
    "ae_threshold": 1,
    "nms_kernel": 3,
    "num_dets": 1000,
    "nms_algorithm": "exp_soft_nms",
    "weight_exp": 8,
    "merge_bbox": False,
    "data_aug": True,
    "lighting": True,
    "border": 64,
    "gaussian_bump": False,
    "gaussian_iou": 0.7,
    "gaussian_radius": -1,
    "rand_crop": False,
    "rand_color": False,
    "rand_center": True,
    "init_sizes": [192, 255],
    "view_sizes": [],
    "min_scale": 16,
    "max_scale": 32,
    # saccade attention
    "att_sizes": [[16, 16], [32, 32], [64, 64]],
    "att_ranges": [[96, 256], [32, 96], [0, 32]],
    "att_ratios": [16, 8, 4],
    "att_scales": [1, 1.5, 2],
    "att_thresholds": [0.3, 0.3, 0.3, 0.3],
    "att_nms_ks": [3, 3, 3],
    "att_max_crops": 8,
    "ref_dets": True,
    # testing
    "test_scales": [1],
    "test_flipped": True,
}


class DetectionConfig:
    """Detection db config with defaults + merge (dbs/detection.py:5-70)."""

    def __init__(self, db_config: dict | None = None):
        self.configs = dict(DETECTION_DEFAULTS)
        for key, value in (db_config or {}).items():
            if key in self.configs:
                self.configs[key] = value
        if self.configs["rand_scales"] is None:
            self.configs["rand_scales"] = list(
                np.arange(
                    self.configs["rand_scale_min"],
                    self.configs["rand_scale_max"],
                    self.configs["rand_scale_step"],
                )
            )

    def __getitem__(self, key):
        return self.configs[key]


def load_cfg(path: str):
    """Read a paired system/db JSON (core/base.py:27-31)."""
    with open(path, "rt") as f:
        cfg = json.load(f)
    return cfg.get("system", {}), cfg.get("db", {})


def tiny_db_overrides(arch: str) -> dict:
    """The shared --tiny db-config overrides for train_detector.py /
    evaluate_detector.py / benchmarks (64x64 input, /4 stem, levels=2
    model). Not a reference feature — the full 511/255-input models take
    minutes per compile on this host, so accuracy gates run this shrunken
    contract instead.

    For CornerNet_Saccade the attention geometry must match the tiny
    model's TWO upsample levels (models/hourglass.py collect_ups returns
    one merge output per level): maps at 8x8 and 16x16 for a 64px input
    (ratios 8 and 4), object-size bands split at 16px, zoom scales [1, 2]
    per iteration, and stage-1 init views at 48/64px.
    """
    tiny = {
        "input_size": [64, 64], "output_sizes": [[16, 16]],
        "test_scales": [1], "top_k": 8, "num_dets": 8, "max_per_image": 10,
        "rand_crop": False, "rand_color": False, "lighting": False,
    }
    if arch.split("-")[0] == "CornerNet_Saccade":
        tiny.update(
            att_sizes=[[8, 8], [16, 16]],
            att_ranges=[[16, 64], [0, 16]],
            att_ratios=[8, 4],
            att_scales=[[1, 2], [1, 2]],
            att_thresholds=[0.3, 0.3],
            att_nms_ks=[3, 3],
            init_sizes=[48, 64],
        )
    return tiny
