"""Utility tests: timers, metrics logger, progress, clustering wrapper."""

import json
import time

import numpy as np

from object_keypoints_tpu.utils import Rate, Timing
from object_keypoints_tpu.utils.clustering import KeypointClustering
from object_keypoints_tpu.utils.metrics import MetricsLogger
from object_keypoints_tpu.utils.progress import Timer, stdout_to_tqdm


class TestTimers:
    def test_timing_stats(self):
        t = Timing()
        for _ in range(3):
            with t.measure("op"):
                time.sleep(0.001)
        mean, std, n = t.stats()["op"]
        assert n == 3 and mean >= 0.001

    def test_tic_toc(self):
        t = Timer()
        t.tic()
        time.sleep(0.001)
        avg = t.toc()
        assert avg >= 0.001 and t.calls == 1

    def test_rate_sleeps(self):
        r = Rate(200)
        t0 = time.monotonic()
        r.sleep()
        r.sleep()
        assert time.monotonic() - t0 >= 0.004


class TestMetricsLogger:
    def test_jsonl_roundtrip(self, tmp_path):
        logger = MetricsLogger(str(tmp_path))
        logger.log(1, {"loss": 2.5})
        logger.log(2, {"loss": 1.25}, prefix="val_")
        logger.close()
        lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
        assert lines[0]["loss"] == 2.5
        assert lines[1]["val_loss"] == 1.25


class TestProgress:
    def test_stdout_to_tqdm(self, capsys):
        with stdout_to_tqdm():
            print("hello")
        out = capsys.readouterr()
        assert "hello" in out.out or "hello" in out.err


class TestClustering:
    def test_meanshift_two_clusters(self):
        rng = np.random.default_rng(0)
        a = rng.normal([0, 0], 0.1, size=(20, 2))
        b = rng.normal([5, 5], 0.1, size=(20, 2))
        centers, labels = KeypointClustering(bandwidth=1.0)(np.concatenate([a, b]))
        assert centers.shape[0] == 2
        assert len(set(labels[:20])) == 1 and len(set(labels[20:])) == 1
