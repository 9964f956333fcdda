"""Inference-driver + config-system + sampler-target tests."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax
import jax.numpy as jnp

from object_keypoints_tpu.data.detection_targets import (
    draw_gaussian,
    gaussian_radius,
    gather_tags,
    render_corner_targets,
)
from object_keypoints_tpu.inference.detector import (
    cornernet_inference,
    crop_image,
    rescale_detections,
)
from object_keypoints_tpu.utils.config import DetectionConfig, SystemConfig, load_cfg


class TestConfig:
    def test_system_config_merge(self):
        cfg = SystemConfig()
        assert cfg.batch_size == 1
        cfg.update_config({"batch_size": 55, "unknown_key": 1})
        assert cfg.batch_size == 55
        with pytest.raises(AttributeError):
            _ = cfg.unknown_key

    def test_detection_defaults_and_merge(self):
        db = DetectionConfig({"input_size": [511, 511], "top_k": 20})
        assert db["input_size"] == [511, 511]
        assert db["nms_kernel"] == 3  # default survives

    def test_rand_scales_expansion(self):
        db = DetectionConfig({"rand_scales": None, "rand_scale_min": 0.6,
                              "rand_scale_max": 1.0, "rand_scale_step": 0.2})
        np.testing.assert_allclose(db["rand_scales"], [0.6, 0.8], atol=1e-9)

    def test_load_cfg_squeeze_json(self):
        sys_cfg, db_cfg = load_cfg("object_keypoints_tpu/configs/CornerNet_Squeeze.json")
        assert sys_cfg["batch_size"] == 55
        assert db_cfg["input_size"] == [511, 511]


class TestCornerTargets:
    def test_gaussian_radius_cases(self):
        r = gaussian_radius((24, 24), 0.7)
        assert 0 < r < 24
        # larger overlap requirement -> smaller radius
        assert gaussian_radius((24, 24), 0.9) < r

    def test_draw_gaussian_peak_and_border(self):
        heat = np.zeros((16, 16), np.float32)
        draw_gaussian(heat, (8, 8), 3)
        assert heat[8, 8] == 1.0
        draw_gaussian(heat, (0, 0), 3)  # border clip must not crash
        assert heat[0, 0] == 1.0

    def test_render_corner_targets_layout(self):
        dets = np.array([[10.0, 20.0, 100.0, 120.0, 1.0],
                         [30.0, 40.0, 60.0, 90.0, 3.0]])
        out = render_corner_targets(dets, categories=3, input_size=(128, 128),
                                    output_size=(32, 32), gaussian_iou=0.3)
        assert out["tl_heatmaps"].shape == (32, 32, 3)
        assert out["tag_mask"][:2].all() and not out["tag_mask"][2:].any()
        # tl corner of det 0 at output scale: (10/4, 20/4) = (2.5, 5.0)
        assert out["tl_heatmaps"][5, 2, 0] == 1.0
        np.testing.assert_allclose(out["tl_regrs"][0], [0.5, 0.0])
        assert out["tl_tags"][0] == 5 * 32 + 2

    def test_gather_tags(self):
        feat = jnp.arange(2 * 4 * 4 * 3, dtype=jnp.float32).reshape(2, 4, 4, 3)
        tags = jnp.asarray([[5, 0], [15, 1]])
        out = np.asarray(gather_tags(feat, tags))
        np.testing.assert_allclose(out[0, 0], np.asarray(feat).reshape(2, 16, 3)[0, 5])


class TestDriver:
    def test_crop_image_centers(self):
        img = np.arange(20 * 30 * 3, dtype=np.uint8).reshape(20, 30, 3)
        canvas, border, offset = crop_image(img, (10, 15), (32, 32))
        assert canvas.shape == (32, 32, 3)
        # original content sits inside the border box
        y0, y1, x0, x1 = border.astype(int)
        assert canvas[y0:y1, x0:x1].sum() == img.sum()

    def test_rescale_roundtrip(self):
        dets = np.array([[[8.0, 4.0, 16.0, 12.0, 0.9, 0.9, 0.9, 0.0]]])
        ratios = np.array([[0.25, 0.25]], np.float32)  # out/inp
        borders = np.array([[10.0, 0, 20.0, 0]], np.float32)
        sizes = np.array([[200.0, 300.0]], np.float32)
        out = rescale_detections(dets.copy(), ratios, borders, sizes)
        np.testing.assert_allclose(out[0, 0, :4], [12.0, 6.0, 44.0, 38.0])

    def test_full_driver_with_planted_decoder(self):
        """Run the whole multi-scale/TTA/NMS driver with a stub decoder that
        plants one box; the output must contain exactly that box in
        original image coordinates."""
        config = DetectionConfig({
            "categories": 2, "input_size": [128, 128], "output_sizes": [[32, 32]],
            "test_scales": [1], "test_flipped": False, "top_k": 5,
            "num_dets": 4, "nms_algorithm": "exp_soft_nms", "max_per_image": 10,
        })

        def decode_fn(images, K, ae_threshold, kernel, num_dets):
            n = images.shape[0]
            dets = np.full((n, num_dets, 8), -1.0, np.float32)
            dets[:, 0] = [4.0, 4.0, 12.0, 12.0, 0.9, 0.9, 0.9, 0.0]  # class 0
            return jnp.asarray(dets)

        image = np.zeros((100, 100, 3), np.uint8)
        out = cornernet_inference(config, decode_fn, image)
        assert set(out.keys()) == {1, 2}
        assert out[1].shape[0] == 1
        assert out[2].shape[0] == 0
        # box decoded at out-stride 4 on the padded image; just check it's
        # inside the original bounds with the right score
        assert out[1][0, 4] == pytest.approx(0.9, rel=1e-3)
        assert (out[1][0, :4] >= 0).all() and (out[1][0, :4] <= 100).all()

    def test_merge_and_cap_paths(self):
        """Exercise merge_bbox=True and a triggering max_per_image cap (the
        two deliberate-divergence paths recorded in PARITY.md "Known gaps"):
        the planted decoder emits one tight cluster of overlapping boxes per
        class plus one isolated box, so soft-NMS-merge decays the cluster
        tails to dead rows and the cap threshold runs over live scores only
        (ours drops dead rows BEFORE the kth computation; the Cython keeps
        stale compacted rows in it)."""
        config = DetectionConfig({
            "categories": 2, "input_size": [128, 128], "output_sizes": [[32, 32]],
            "test_scales": [1], "test_flipped": False, "top_k": 8,
            "num_dets": 8, "nms_algorithm": "exp_soft_nms", "max_per_image": 3,
            "merge_bbox": True, "weight_exp": 6.0,
        })

        def decode_fn(images, K, ae_threshold, kernel, num_dets):
            n = images.shape[0]
            dets = np.full((n, num_dets, 8), -1.0, np.float32)
            # class 0: 3-box cluster (near-identical, decaying scores) +
            # one isolated box far away
            dets[:, 0] = [4.0, 4.0, 12.0, 12.0, 0.90, 0.8, 0.8, 0.0]
            dets[:, 1] = [4.5, 4.5, 12.5, 12.5, 0.80, 0.7, 0.7, 0.0]
            dets[:, 2] = [5.0, 5.0, 13.0, 13.0, 0.70, 0.6, 0.6, 0.0]
            dets[:, 3] = [20.0, 20.0, 28.0, 28.0, 0.60, 0.9, 0.9, 0.0]
            # class 1: two isolated boxes
            dets[:, 4] = [4.0, 20.0, 12.0, 28.0, 0.50, 0.5, 0.5, 1.0]
            dets[:, 5] = [20.0, 4.0, 28.0, 12.0, 0.40, 0.5, 0.5, 1.0]
            return jnp.asarray(dets)

        image = np.zeros((100, 100, 3), np.uint8)
        out = cornernet_inference(config, decode_fn, image)

        # gaussian decay with near-unit IoU kills the two cluster tails
        # (0.8*e^{-1/0.5} ~ 0.1 > 0.001 stays live actually — compute: IoU of
        # the planted cluster ~0.88, weight = exp(-0.88^2/0.5) = 0.21;
        # 0.8*0.21 = 0.17 live, 0.7*0.21*... second round vs merged box) —
        # either way scores strictly order: cluster peak > isolated(0.6) >
        # decayed tails and class-1 rows. Cap keeps the global top-3 scores.
        scores = np.sort(np.concatenate([out[1][:, 4], out[2][:, 4]]))[::-1]
        assert len(scores) <= 3 + 1  # ties at the kth threshold may all pass
        assert scores[0] == pytest.approx(0.90, rel=1e-2)

        # merge mode moved the cluster peak toward its neighbors: the output
        # box is a corner-score-weighted average, strictly between the
        # cluster's extremes and not equal to the raw argmax box
        peak = out[1][np.argmax(out[1][:, 4])]
        lo, hi = 4.0, 5.0  # planted x1 range of the cluster
        x1_img = peak[0]
        # map the planted output-space box through the same rescale the
        # driver applied to recover output-space coords is fiddly; instead
        # assert the merge moved the peak box AWAY from where the pure
        # (no-merge) driver puts it
        config_nomerge = DetectionConfig({
            "categories": 2, "input_size": [128, 128], "output_sizes": [[32, 32]],
            "test_scales": [1], "test_flipped": False, "top_k": 8,
            "num_dets": 8, "nms_algorithm": "exp_soft_nms", "max_per_image": 3,
            "merge_bbox": False,
        })
        out_nomerge = cornernet_inference(config_nomerge, decode_fn, image)
        peak_nomerge = out_nomerge[1][np.argmax(out_nomerge[1][:, 4])]
        assert peak[4] == pytest.approx(peak_nomerge[4], rel=1e-5)  # same score
        assert np.abs(peak[:4] - peak_nomerge[:4]).max() > 0.1  # merged coords moved
        # and the merge pulled the peak toward the (larger-coordinate) tails
        assert (peak[:4] > peak_nomerge[:4] - 1e-4).all()
