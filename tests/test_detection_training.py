"""Detection trainer + COCO dataset tests."""

import json

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from object_keypoints_tpu.data.coco import CocoDetectionDataset
from object_keypoints_tpu.data.detection_targets import render_corner_targets
from object_keypoints_tpu.models.cornernet import CornerNetModel
from object_keypoints_tpu.training.detection import (
    make_detection_optimizer,
    step_decay_schedule,
    train_detector,
)
from object_keypoints_tpu.utils.config import SystemConfig


def _tiny_model():
    return CornerNetModel(
        categories=2, stacks=1, levels=2, dims=(8, 8, 16), mods=(1, 1, 1),
        hourglass="fire", stem_residuals=2, cnv_dim=8,
    )


def _batch(rng, n=2, size=32, cats=2, m=8):
    oh = ow = size // 8
    dets = np.array([[2.0, 2.0, 20.0, 24.0, 1.0]])
    t = render_corner_targets(dets, cats, (size, size), (oh, ow), max_tag_len=m)
    return {
        "images": jnp.asarray(rng.normal(size=(n, size, size, 3)), jnp.float32),
        "tl_heatmaps": jnp.stack([jnp.asarray(t["tl_heatmaps"])] * n),
        "br_heatmaps": jnp.stack([jnp.asarray(t["br_heatmaps"])] * n),
        "tl_regrs": jnp.stack([jnp.asarray(t["tl_regrs"])] * n),
        "br_regrs": jnp.stack([jnp.asarray(t["br_regrs"])] * n),
        "tl_tags": jnp.stack([jnp.asarray(t["tl_tags"])] * n),
        "br_tags": jnp.stack([jnp.asarray(t["br_tags"])] * n),
        "tag_mask": jnp.stack([jnp.asarray(t["tag_mask"])] * n),
    }


class TestSchedule:
    def test_step_decay(self):
        s = step_decay_schedule(1e-3, stepsize=100, decay_rate=10)
        assert s(0) == pytest.approx(1e-3)
        assert s(99) == pytest.approx(1e-3)
        assert s(100) == pytest.approx(1e-4)
        assert s(250) == pytest.approx(1e-5)


class TestDetectionTrainer:
    def test_loss_decreases(self):
        model = _tiny_model()
        rng = np.random.default_rng(0)
        batch = _batch(rng)
        variables = model.init({"params": jax.random.key(0)}, batch["images"])
        cfg = SystemConfig(
            learning_rate=3e-3, max_iter=40, display=40, snapshot=1000,
            stepsize=1000, opt_algo="adam",
        )

        losses = []

        def batches():
            while True:
                yield batch

        state = train_detector(
            model, variables, cfg, batches(), on_display=lambda m: losses.append(m)
        )
        assert int(state.step) == 40
        # recompute loss trend by one more step pair
        from object_keypoints_tpu.training.detection import detection_train_step

        _, m_end = detection_train_step(model, state, batch)
        assert np.isfinite(float(m_end["loss"]))

    def test_snapshot_written(self, tmp_path):
        model = _tiny_model()
        rng = np.random.default_rng(1)
        batch = _batch(rng)
        variables = model.init({"params": jax.random.key(0)}, batch["images"])
        cfg = SystemConfig(max_iter=4, snapshot=2, display=100, snapshot_name="det")

        def batches():
            while True:
                yield batch

        train_detector(model, variables, cfg, batches(), snapshot_dir=str(tmp_path))
        assert (tmp_path / "det_2").exists()
        assert (tmp_path / "det_4").exists()


class TestCocoDataset:
    @pytest.fixture()
    def coco_dir(self, tmp_path):
        ann = {
            "images": [
                {"id": 7, "file_name": "a.jpg", "width": 64, "height": 48},
                {"id": 9, "file_name": "b.jpg", "width": 64, "height": 48},
            ],
            "annotations": [
                {"id": 1, "image_id": 7, "category_id": 17,
                 "bbox": [4, 4, 16, 20], "iscrowd": 0},
                {"id": 2, "image_id": 7, "category_id": 18,
                 "bbox": [30, 10, 10, 10], "iscrowd": 0},
                {"id": 3, "image_id": 9, "category_id": 17,
                 "bbox": [8, 8, 12, 12], "iscrowd": 1},  # crowd: skipped
            ],
            "categories": [{"id": 17, "name": "cat"}, {"id": 18, "name": "dog"}],
        }
        path = tmp_path / "ann.json"
        path.write_text(json.dumps(ann))
        return str(path), str(tmp_path)

    def test_indexing(self, coco_dir):
        ann, img_dir = coco_dir
        ds = CocoDetectionDataset(ann, img_dir)
        assert len(ds) == 2
        dets = ds.detections(0)  # image id 7
        assert dets.shape == (2, 5)
        assert set(dets[:, 4]) == {1.0, 2.0}  # contiguous class ids
        assert ds.detections(1).shape == (0, 5)  # crowd filtered
        assert ds.class_names[1] == "cat"

    def test_results_roundtrip_and_fallback_eval(self, coco_dir, tmp_path):
        ann, img_dir = coco_dir
        ds = CocoDetectionDataset(ann, img_dir)
        # perfect predictions for image 7
        all_bboxes = {7: {1: np.array([[4, 4, 20, 24, 0.95]]),
                          2: np.array([[30, 10, 40, 20, 0.9]])}}
        results = ds.convert_to_coco(all_bboxes)
        assert results[0]["bbox"] == [4.0, 4.0, 16.0, 20.0]
        result_json = tmp_path / "results.json"
        result_json.write_text(json.dumps(results))
        out = ds._evaluate_fallback(str(result_json))
        assert out["mAP"] > 0.99
