"""Saccade two-stage inference tests with a stubbed decoder."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from object_keypoints_tpu.inference.saccade import (
    cornernet_saccade_inference,
    crop_zoom,
    decode_atts,
    get_ref_locs,
    location_nms,
)
from object_keypoints_tpu.utils.config import DetectionConfig


class TestPieces:
    def test_crop_zoom_scales_content(self):
        img = np.zeros((100, 100, 3), np.float32)
        img[40:60, 40:60] = 1.0
        canvas, offset = crop_zoom(img, (50, 50), (50, 50), (100, 100))
        # 50px window scaled x2 into 100: the white square doubles
        assert canvas.sum() == pytest.approx(40 * 40 * 3, rel=0.1)
        np.testing.assert_allclose(offset, [25.0, 25.0])

    def test_get_ref_locs_scale_buckets(self):
        dets = np.array([
            [0, 0, 200, 100, 0.9, 0, 0, 0],   # maxhw 200 -> scale 192/200
            [0, 0, 50, 40, 0.9, 0, 0, 0],     # maxhw 50 -> 64/50
            [0, 0, 10, 10, 0.9, 0, 0, 0],     # maxhw 10 -> 24/10
            [0, 0, 10, 10, 0.2, 0, 0, 0],     # low score -> dropped
        ], np.float32)
        locs = get_ref_locs(dets)
        assert locs.shape == (3, 4)
        np.testing.assert_allclose(locs[:, 2], [192 / 200, 64 / 50, 24 / 10])

    def test_location_nms_suppresses_near_same_scale(self):
        locs = np.array([
            [50, 50, 1.0, 0.9],
            [52, 52, 1.0, 0.8],   # near + same scale -> suppressed
            [52, 52, 2.0, 0.7],   # different scale -> kept
            [200, 200, 1.0, 0.6],  # far -> kept
        ], np.float32)
        out = location_nms(locs, thresh=16)
        assert out.shape[0] == 3

    def test_decode_atts_thresholds_and_ranges(self):
        config = DetectionConfig({})
        att = np.zeros((1, 4, 4, 1), np.float32)
        att[0, 1, 2, 0] = 0.9
        atts = [att, np.zeros((1, 8, 8, 1), np.float32), np.zeros((1, 16, 16, 1), np.float32)]
        scales = np.array([1.0], np.float32)
        offsets = np.zeros((1, 2), np.float32)
        locs = decode_atts(config, atts, config["att_scales"], scales, offsets,
                           256, 256, thresh=0.3)
        assert locs.shape[0] == 1
        # y = 1 * ratio(16) / 1 + 0, x = 2 * 16
        np.testing.assert_allclose(locs[0, :2], [16.0, 32.0])


class TestDeviceCrops:
    def test_device_crop_batch_matches_host(self):
        """The jitted batched crop-zoom must match the host cv2 path
        (same window geometry; bilinear resample to ~visual tolerance)."""
        from object_keypoints_tpu.inference.saccade import (
            _device_crop_zoom_batch,
            crop_zoom,
        )

        rng = np.random.default_rng(0)
        image = rng.uniform(0, 1, size=(96, 120, 3)).astype(np.float32)
        # interior, border-clipped, and zoom-out cases
        cases = [((48.0, 60.0), (32, 32)), ((8.0, 8.0), (40, 40)),
                 ((80.0, 110.0), (64, 48)), ((48.0, 60.0), (128, 160))]
        centers = np.array([c for c, _ in cases], np.float32)
        sizes = np.array([s for _, s in cases], np.float32)
        dev_imgs, dev_offs = _device_crop_zoom_batch(image, centers, sizes, (64, 64))
        for i, (center, size) in enumerate(cases):
            host_img, host_off = crop_zoom(image, center, (int(size[0]), int(size[1])), (64, 64))
            np.testing.assert_allclose(np.asarray(dev_offs[i]), host_off)
            d = np.abs(np.asarray(dev_imgs[i]) - host_img)
            assert d.max() < 5e-3, (i, d.max())
            assert d.mean() < 5e-5, (i, d.mean())

    def test_prepare_images_reuses_one_compiled_program(self):
        """Different location counts (<= att_max_crops) must pad to one
        fixed shape and hit the SAME compiled crop program — no retrace
        (round-2 advisor finding: a fresh @jax.jit closure per call)."""
        from object_keypoints_tpu.inference.saccade import (
            _crop_zoom_program,
            _prepare_images,
        )

        rng = np.random.default_rng(1)
        image = rng.uniform(0, 1, size=(96, 120, 3)).astype(np.float32)
        cfg = {"input_size": [64, 64], "att_max_crops": 4}
        prog = _crop_zoom_program(96, 120, 64, 64)
        assert prog is _crop_zoom_program(96, 120, 64, 64)

        locs2 = np.array([[48, 60, 1.0], [8, 8, 2.0]], np.float32)
        locs3 = np.array([[48, 60, 1.0], [8, 8, 2.0], [20, 30, 1.0]], np.float32)
        imgs, offs = _prepare_images(cfg, image, locs2)
        assert imgs.shape == (2, 64, 64, 3) and offs.shape == (2, 2)
        assert prog._cache_size() == 1
        _prepare_images(cfg, image, locs3)
        assert prog._cache_size() == 1  # padded to capacity -> same program

    def test_full_inference_with_device_crops(self):
        """The two-stage driver runs end-to-end with device crops on."""
        config = DetectionConfig({
            "categories": 2, "input_size": [64, 64], "output_sizes": [[16, 16]],
            "init_sizes": [32], "att_max_crops": 4,
            "att_thresholds": [0.3, 0.3], "att_scales": [[1, 2, 4], [1, 2, 4]],
            "att_nms_ks": [3, 3, 3], "nms_algorithm": "exp_soft_nms",
            "max_per_image": 10, "ref_dets": True,
        })

        def decode_fn(images, no_att):
            n = images.shape[0]
            dets = np.full((n, 6, 8), -1.0, np.float32)
            dets[:, 0] = [2.0, 2.0, 8.0, 8.0, 0.8, 0.8, 0.8, 1.0]
            atts = None
            if not no_att:
                a1 = np.zeros((n, 4, 4, 1), np.float32)
                a1[:, 2, 2, 0] = 0.9
                atts = [jnp.asarray(a1),
                        jnp.asarray(np.zeros((n, 8, 8, 1), np.float32)),
                        jnp.asarray(np.zeros((n, 16, 16, 1), np.float32))]
            return jnp.asarray(dets), atts

        image = np.zeros((128, 128, 3), np.uint8)
        out = cornernet_saccade_inference(config, decode_fn, image,
                                          device_crops=True)
        assert set(out.keys()) == {1, 2}
        assert out[2].shape[0] >= 1


class TestFullSaccade:
    def test_two_stage_with_stub(self):
        config = DetectionConfig({
            "categories": 2, "input_size": [64, 64], "output_sizes": [[16, 16]],
            "init_sizes": [32], "att_max_crops": 4,
            "att_thresholds": [0.3, 0.3], "att_scales": [[1, 2, 4], [1, 2, 4]],
            "att_nms_ks": [3, 3, 3], "nms_algorithm": "exp_soft_nms",
            "max_per_image": 10, "ref_dets": True,
        })

        calls = {"n": 0}

        def decode_fn(images, no_att):
            calls["n"] += 1
            n = images.shape[0]
            dets = np.full((n, 6, 8), -1.0, np.float32)
            dets[:, 0] = [2.0, 2.0, 8.0, 8.0, 0.8, 0.8, 0.8, 1.0]
            atts = None
            if not no_att:
                a1 = np.zeros((n, 4, 4, 1), np.float32)
                a1[:, 2, 2, 0] = 0.9  # one strong attention peak
                atts = [jnp.asarray(a1),
                        jnp.asarray(np.zeros((n, 8, 8, 1), np.float32)),
                        jnp.asarray(np.zeros((n, 16, 16, 1), np.float32))]
            return jnp.asarray(dets), atts

        image = np.zeros((128, 128, 3), np.uint8)
        out = cornernet_saccade_inference(config, decode_fn, image)
        assert calls["n"] >= 2  # stage 1 + at least one zoom pass
        assert set(out.keys()) == {1, 2}
        assert out[2].shape[0] >= 1  # planted class-1 (0-based) boxes
        # the strongest instance survives; duplicates are soft-NMS-decayed
        assert out[2][:, 4].max() > 0.7
        assert (out[2][:, 4] > 0.0).all()


class TestRealModelDecodeFn:
    def test_two_stage_with_tiny_real_model(self):
        """Drive cornernet_saccade_inference through make_saccade_decode_fn
        over a REAL (tiny) attention CornerNetModel, forcing both the
        attention and the final no_att decode branches — the attention
        model's test-mode output is ((dets, ...heads), atts) in BOTH cases
        (models/cornernet.py test path), which a stub can't regress."""
        import jax

        from object_keypoints_tpu.inference.saccade import make_saccade_decode_fn
        from object_keypoints_tpu.models.cornernet import CornerNetModel

        config = DetectionConfig({
            "categories": 2, "input_size": [64, 64], "output_sizes": [[16, 16]],
            "init_sizes": [32], "att_max_crops": 8,
            "att_thresholds": [0.0, 0.0],  # zoom into every attention peak
            "att_scales": [[1, 2], [1, 2]], "att_nms_ks": [3, 3],
            "nms_algorithm": "exp_soft_nms", "max_per_image": 10,
            "ref_dets": True, "top_k": 4, "num_dets": 8,
        })
        model = CornerNetModel(
            categories=2, stacks=1, levels=2, dims=(8, 8, 16), mods=(1, 1, 1),
            hourglass="residual", stem_residuals=1, cnv_dim=8,
            with_attention=True,
        )
        dummy = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, dummy)
        decode_fn = make_saccade_decode_fn(model, variables, config)

        # both branches directly: atts list with attention, None without
        dets, atts = decode_fn(dummy, False)
        assert dets.shape == (1, 8, 8) and len(atts) == 2
        dets2, atts2 = decode_fn(dummy, True)
        assert dets2.shape == (1, 8, 8) and atts2 is None
        np.testing.assert_allclose(np.asarray(dets), np.asarray(dets2))

        # and through the full two-stage driver (np.array(dets) on the
        # no_att iteration crashed when decode_fn returned the raw tuple)
        image = (np.random.default_rng(0).uniform(0, 255, (96, 96, 3))
                 .astype(np.uint8))
        out = cornernet_saccade_inference(config, decode_fn, image)
        assert isinstance(out, dict) and set(out.keys()) <= {1, 2}


class TestFusedCropDecode:
    def test_fused_matches_split_pipeline(self):
        """make_saccade_decode_fn_fused (normalize+crop+forward+decode as
        one program, pow2-padded crop batches) must reproduce the split
        device-crops pipeline's final boxes on a real tiny attention model:
        pad rows are independent in test mode (no dropout, frozen BN), the
        crop geometry is the shared _crop_all_fn, and in-program
        normalization commutes with the bilinear resample."""
        import jax

        from object_keypoints_tpu.inference.saccade import (
            make_saccade_decode_fn,
            make_saccade_decode_fn_fused,
        )
        from object_keypoints_tpu.models.cornernet import CornerNetModel

        config = DetectionConfig({
            "categories": 2, "input_size": [64, 64], "output_sizes": [[16, 16]],
            "init_sizes": [32], "att_max_crops": 8,
            "att_thresholds": [0.0, 0.0],  # zoom into every attention peak
            "att_scales": [[1, 2], [1, 2]], "att_nms_ks": [3, 3],
            "nms_algorithm": "exp_soft_nms", "max_per_image": 10,
            "ref_dets": True, "top_k": 4, "num_dets": 8,
        })
        model = CornerNetModel(
            categories=2, stacks=1, levels=2, dims=(8, 8, 16), mods=(1, 1, 1),
            hourglass="residual", stem_residuals=1, cnv_dim=8,
            with_attention=True,
        )
        variables = model.init({"params": jax.random.key(0)},
                               jnp.zeros((1, 64, 64, 3), jnp.float32))
        split_fn = make_saccade_decode_fn(model, variables, config)
        fused_fn = make_saccade_decode_fn_fused(model, variables, config)
        assert fused_fn.crop_fused and fused_fn.att_nms_fused

        image = (np.random.default_rng(1).uniform(0, 255, (96, 128, 3))
                 .astype(np.uint8))
        out_split = cornernet_saccade_inference(config, split_fn, image)
        out_fused = cornernet_saccade_inference(config, fused_fn, image)
        assert set(out_split.keys()) == set(out_fused.keys())
        for j in out_split:
            a, b = out_split[j], out_fused[j]
            assert a.shape == b.shape, (j, a.shape, b.shape)
            if len(a):
                np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)
