"""Data pipeline tests: synthetic sequence roundtrip through SceneDataset,
augmentation geometry, combinators, prefetch."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from object_keypoints_tpu.data import augment
from object_keypoints_tpu.data.combinators import Chain, RoundRobin, SamplingPool, batched
from object_keypoints_tpu.data.prefetch import device_prefetch
from object_keypoints_tpu.data.scene import SceneDataset, StereoVideoDataset
from object_keypoints_tpu.data.synthetic import write_synthetic_sequence


@pytest.fixture(scope="module")
def sequence_dir(tmp_path_factory, calibration_file):
    out = tmp_path_factory.mktemp("seq") / "seq_00"
    write_synthetic_sequence(
        str(out), calibration_file, keypoint_config=[1, 3], n_objects=1,
        n_frames=6, seed=3,
    )
    return str(out)


class TestSceneDataset:
    def test_iterates_with_expected_shapes(self, sequence_dir):
        ds = SceneDataset(sequence_dir, {"keypoint_config": [1, 3]})
        assert len(ds) == 6
        examples = list(ds)
        assert len(examples) == 6
        e = examples[0]
        assert e["frame"].shape == (511, 511, 3)
        assert e["heatmaps"].shape == (64, 64, 3)  # center + 2 type maps
        assert e["depth"].shape == (64, 64, 3)
        assert e["centers"].shape == (64, 64, 2, 2)
        assert np.isfinite(e["frame"]).all()
        # heatmaps normalized into [0, 1] with a true peak
        assert 0.99 <= e["heatmaps"].max() <= 1.0

    def test_heatmap_peaks_near_projected_keypoints(self, sequence_dir):
        ds = SceneDataset(sequence_dir, {"keypoint_config": [1, 3]})
        e = next(iter(ds))
        # the center-map argmax must be within the splat radius of the
        # projected object center
        heat = e["heatmaps"][..., 0]
        y, x = np.unravel_index(heat.argmax(), heat.shape)
        T_CW = np.asarray(
            __import__("object_keypoints_tpu.geometry.linalg", fromlist=["inv_transform"]).inv_transform(ds.poses[0])
        )
        projected = ds.camera.project(ds.world_points, T_CW)
        # apply the resize/crop chain: scale 511/720, x-offset, then 64/511
        scale = 511.0 / 720.0
        offset_x = (round(1280 * scale) - 511) // 2
        p = projected[0] * scale - np.array([offset_x, 0.0])
        p64 = p * 64.0 / 511.0
        assert np.hypot(p64[0] - x, p64[1] - y) < 2.0

    def test_include_pose(self, sequence_dir):
        ds = SceneDataset(sequence_dir, {"keypoint_config": [1, 3]}, include_pose=True)
        e = next(iter(ds))
        assert e["T_WC"].shape == (4, 4)
        assert e["keypoints"].shape == (4, ds.n_keypoints, 2)

    def test_augment_mode_runs(self, sequence_dir):
        ds = SceneDataset(sequence_dir, {"keypoint_config": [1, 3]}, augment=True, seed=0)
        e = next(iter(ds))
        assert e["frame"].shape == (511, 511, 3)

    def test_stale_alias_exists(self):
        assert StereoVideoDataset is SceneDataset

    def test_normalize_false_emits_raw_uint8(self, sequence_dir):
        """normalize=False ships the raw uint8 frame (the training loop's
        4x-cheaper device transfer); the host normalizer applied to it must
        reproduce the default output exactly, and targets are unaffected."""
        from object_keypoints_tpu.constants import RGB_MEAN, RGB_STD
        from object_keypoints_tpu.data.native import normalize_image

        kc = {"keypoint_config": [1, 3]}
        raw = next(iter(SceneDataset(sequence_dir, kc, normalize=False)))
        ref = next(iter(SceneDataset(sequence_dir, kc)))
        assert raw["frame"].dtype == np.uint8
        np.testing.assert_array_equal(
            normalize_image(raw["frame"], RGB_MEAN, RGB_STD), ref["frame"]
        )
        np.testing.assert_array_equal(raw["heatmaps"], ref["heatmaps"])

    def test_wrong_keypoint_count_asserts(self, sequence_dir):
        with pytest.raises(AssertionError):
            SceneDataset(sequence_dir, {"keypoint_config": [1, 1, 1]})  # 5 per object vs 4 labeled


class TestAugment:
    def test_resize_crop_keypoint_consistency(self):
        img = np.zeros((720, 1280, 3), np.uint8)
        img[360, 640] = 255
        kps = np.array([[640.0, 360.0]])
        out, kout = augment.smallest_max_size(img, kps, 511)
        assert out.shape[0] == 511
        out, kout = augment.center_crop(out, kout, 511, 511)
        assert out.shape[:2] == (511, 511)
        # the bright pixel must land where the keypoint says
        y, x = np.unravel_index(out[..., 0].argmax(), out.shape[:2])
        assert abs(x - kout[0, 0]) < 1.5 and abs(y - kout[0, 1]) < 1.5

    def test_flips_move_keypoints(self):
        img = np.arange(100 * 80 * 3, dtype=np.uint8).reshape(100, 80, 3)
        kps = np.array([[10.0, 20.0]])
        h_img, h_kps = augment.hflip(img, kps)
        assert h_kps[0, 0] == 80 - 1 - 10
        v_img, v_kps = augment.vflip(img, kps)
        assert v_kps[0, 1] == 100 - 1 - 20
        np.testing.assert_array_equal(h_img[:, -11], img[:, 10])

    def test_photometric_preserve_shape_dtype(self):
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, size=(64, 64, 3), dtype=np.uint8)
        for fn in (augment.random_brightness_contrast, augment.random_gamma,
                   augment.clahe, augment.cutout):
            out = fn(img, rng)
            assert out.shape == img.shape and out.dtype == np.uint8


class TestAugmentDevice:
    """The device-side stochastic suffix (data/augment_device.py) against
    the host pipeline's math."""

    def test_bcg_matches_host_luts(self):
        """Fixed (alpha, beta, gamma): the device transform must equal the
        host's composed uint8 LUTs within one quantization step on every
        input value."""
        import jax.numpy as jnp

        from object_keypoints_tpu.data.augment_device import apply_bcg

        ramp = np.arange(256, dtype=np.uint8).reshape(16, 16, 1)
        for alpha, beta, gamma in ((1.13, -0.07, 0.85), (0.86, 0.19, 1.17),
                                   (1.0, 0.0, 1.0)):
            # host: bc LUT then gamma LUT (augment.py LUT builders)
            bc = np.clip(np.arange(256, dtype=np.float32) * alpha
                         + beta * 255.0, 0, 255).astype(np.uint8)
            g = (np.linspace(0, 1, 256) ** gamma * 255.0).astype(np.uint8)
            host = g[bc][ramp]
            dev = np.asarray(apply_bcg(jnp.asarray(ramp, jnp.float32),
                                       alpha, beta, gamma))
            assert np.abs(dev - host.astype(np.float32)).max() <= 1.0

    def test_flip_device_matches_host(self):
        import jax.numpy as jnp

        from object_keypoints_tpu.data.augment_device import flip_device

        img = np.arange(40 * 30 * 3, dtype=np.float32).reshape(40, 30, 3)
        kps = np.array([[10.0, 20.0], [3.0, 7.0]], np.float32)
        h_img, h_kps = augment.hflip(img, kps)
        d_img, d_kps = flip_device(jnp.asarray(img), jnp.asarray(kps),
                                   True, False)
        np.testing.assert_array_equal(np.asarray(d_img), h_img)
        np.testing.assert_allclose(np.asarray(d_kps), h_kps)
        v_img, v_kps = augment.vflip(img, kps)
        d_img, d_kps = flip_device(jnp.asarray(img), jnp.asarray(kps),
                                   False, True)
        np.testing.assert_array_equal(np.asarray(d_img), v_img)
        np.testing.assert_allclose(np.asarray(d_kps), v_kps)

    def test_cutout_geometry(self):
        """Holes are 25x25 windows clipped at borders, filled with 0."""
        import jax
        import jax.numpy as jnp

        from object_keypoints_tpu.data.augment_device import cutout

        frame = jnp.full((64, 64, 3), 200.0)
        out = np.asarray(cutout(frame, jax.random.key(0)))
        holes = out[..., 0] == 0
        assert holes.any() and not holes.all()
        # every zeroed pixel keeps all channels zero (fill, not noise)
        np.testing.assert_array_equal(out[holes], 0.0)

    def test_photometric_device_runs_and_keeps_range(self):
        import jax
        import jax.numpy as jnp

        from object_keypoints_tpu.data.augment_device import photometric_device

        rng = np.random.default_rng(0)
        frame = rng.integers(0, 255, size=(32, 32, 3), dtype=np.uint8)
        kps = rng.uniform(0, 31, size=(8, 2)).astype(np.float32)
        for s in range(4):
            out, kout = photometric_device(jnp.asarray(frame),
                                           jnp.asarray(kps),
                                           jax.random.key(s))
            out = np.asarray(out)
            assert out.min() >= 0.0 and out.max() <= 255.0
            assert np.asarray(kout).shape == kps.shape


class TestCombinators:
    def test_round_robin_cycles(self):
        rr = RoundRobin([[1, 2], [10]])
        it = iter(rr)
        assert [next(it) for _ in range(6)] == [1, 10, 2, 10, 1, 10]

    def test_chain(self):
        c = Chain([[1, 2], [3]], shuffle=False)
        assert list(c) == [1, 2, 3]
        assert len(c) == 3

    def test_sampling_pool_is_permutation(self):
        pool = SamplingPool(range(50), pool_size=10, seed=1)
        out = list(pool)
        assert sorted(out) == list(range(50))
        assert out != list(range(50))

    def test_batched(self):
        data = [{"x": np.ones(2) * i} for i in range(5)]
        batches = list(batched(data, 2))
        assert len(batches) == 2
        assert batches[0]["x"].shape == (2, 2)

    def test_device_prefetch(self):
        data = [{"x": np.ones((2, 2)) * i} for i in range(4)]
        out = list(device_prefetch(iter(data)))
        assert len(out) == 4
        assert float(out[3]["x"][0, 0]) == 3.0

    def test_device_prefetch_propagates_errors(self):
        def gen():
            yield {"x": np.ones(2)}
            raise ValueError("boom")

        with pytest.raises(ValueError, match="boom"):
            list(device_prefetch(gen()))
