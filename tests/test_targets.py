"""Target-rendering tests — boundary semantics of the discrete-kernel paste
(reference test/test_video_dataset.py) plus the device splat / center-field
/ depth-field renderers."""

import numpy as np
import jax.numpy as jnp

from object_keypoints_tpu.data import targets as T


class TestDiscreteKernel:
    def setup_method(self):
        self.kernel = T.compute_kernel(50, 25)

    def test_center_placement(self):
        target = np.zeros((120, 160), np.float32)
        T.add_discrete_kernel(target, self.kernel, np.array([[80.0, 60.0]]), center=25)
        assert target.max() == self.kernel[25, 25]
        assert target[60, 80] == target.max()

    def test_near_origin(self):
        target = np.zeros((120, 160), np.float32)
        T.add_discrete_kernel(target, self.kernel, np.array([[1.0, 1.0]]), center=25)
        assert target.max() == self.kernel[25, 25]
        assert target[1, 1] == target.max()
        assert target.max() > 1e-3

    def test_past_end_x(self):
        target = np.zeros((120, 160), np.float32)
        T.add_discrete_kernel(target, self.kernel, np.array([[165.0, 60.0]]), center=25)
        assert target.max() != self.kernel[25, 25]
        assert target[60, 159] == target.max()

    def test_past_end_both(self):
        target = np.zeros((120, 160), np.float32)
        T.add_discrete_kernel(target, self.kernel, np.array([[165.0, 130.0]]), center=25)
        assert target[119, 159] == target.max()

    def test_before_beginning(self):
        target = np.zeros((120, 160), np.float32)
        T.add_discrete_kernel(target, self.kernel, np.array([[-10.0, -130.0]]), center=25)
        assert target[0, 1] == target.max()

    def test_subpixel_rounding(self):
        target = np.zeros((360, 640), np.float32)
        T.add_discrete_kernel(target, self.kernel, np.array([[353.5, 153.8]]), center=25)
        assert target[154, 354] == target.max()

    def test_large_image(self):
        target = np.zeros((720, 1280), np.float32)
        T.add_discrete_kernel(target, self.kernel, np.array([[456.02, 34.744]]), center=25)
        assert target.max() > 1e-3


class TestDeviceSplat:
    def test_peak_at_keypoint(self):
        pts = jnp.array([[31.3, 17.8]])
        heat = np.asarray(T.splat_gaussian((64, 64), pts, jnp.array([True])))
        y, x = np.unravel_index(heat.argmax(), heat.shape)
        assert (x, y) == (31, 18)
        assert heat.max() <= 1.0 + 1e-6

    def test_window_truncation(self):
        pts = jnp.array([[32.0, 32.0]])
        heat = np.asarray(
            T.splat_gaussian((64, 64), pts, jnp.array([True]), length_scale=50.0)
        )
        # outside the radius-8 window everything must be exactly zero
        assert heat[32, 32 + T.KERNEL_RADIUS] > 0.0
        assert heat[32, 32 + T.KERNEL_RADIUS + 1] == 0.0

    def test_invalid_points_ignored(self):
        pts = jnp.array([[10.0, 10.0], [40.0, 40.0]])
        heat = np.asarray(
            T.splat_gaussian((64, 64), pts, jnp.array([True, False]))
        )
        assert heat[10, 10] > 0.5
        assert heat[40, 40] == 0.0

    def test_additive_overlap(self):
        pts = jnp.array([[20.0, 20.0], [21.0, 20.0]])
        heat = np.asarray(T.splat_gaussian((64, 64), pts, jnp.array([True, True])))
        solo = np.asarray(T.splat_gaussian((64, 64), pts[:1], jnp.array([True])))
        assert heat[20, 20] > solo[20, 20]  # additive like video.py:52-55


class TestRenderAll:
    def _fixture(self):
        config = (1, 1, 3)  # center map + [1, 3]
        points = jnp.array(
            [[[32.0, 32.0], [30.0, 30.0], [40.0, 40.0], [42.0, 40.0], [40.0, 42.0]]]
        )
        p_C = jnp.concatenate(
            [points, jnp.full((1, 5, 1), 1.5)], axis=-1
        )
        valid = jnp.ones((1, 5), bool)
        return config, points, p_C, valid

    def test_shapes_and_normalization(self):
        config, points, p_C, valid = self._fixture()
        heat, depth, centers = T.render_all_targets(points, p_C, valid, config, (64, 64))
        assert heat.shape == (3, 64, 64)
        assert depth.shape == (3, 64, 64)
        assert centers.shape == (2, 2, 64, 64)
        assert float(jnp.max(heat)) <= 1.0
        assert float(jnp.max(heat[0])) == 1.0  # normalized per map

    def test_center_field_points_to_center(self):
        config, points, p_C, valid = self._fixture()
        _, _, centers = T.render_all_targets(points, p_C, valid, config, (64, 64))
        centers = np.asarray(centers)
        # at the type-0 keypoint (30, 30): pixel center (30.5, 30.5),
        # stored vector = object center - pixel center = (32, 32) - (30.5, 30.5)
        np.testing.assert_allclose(centers[0, :, 30, 30], [1.5, 1.5], atol=1e-5)
        # outside every disc the field is zero
        assert centers[0, 0, 5, 5] == 0.0

    def test_depth_field(self):
        config, points, p_C, valid = self._fixture()
        _, depth, _ = T.render_all_targets(points, p_C, valid, config, (64, 64))
        depth = np.asarray(depth)
        assert depth[0, 32, 32] == 1.5  # center map disc
        assert depth[1, 30, 30] == 1.5
        assert depth[2, 40, 40] == 1.5
        assert depth[1, 5, 5] == 0.0

    def test_host_renderer_matches_device(self):
        """The native/numpy host fallback (render_all_targets_host) must be
        pixel-exact vs the jitted device renderer — same maps, same overwrite
        order, same normalize-and-clip."""
        config = (1, 1, 3)
        rng = np.random.default_rng(3)
        points = rng.uniform(4, 60, size=(2, 5, 2)).astype(np.float32)
        p_C = np.concatenate(
            [points, rng.uniform(0.5, 2.0, size=(2, 5, 1)).astype(np.float32)],
            axis=-1,
        )
        valid = rng.uniform(size=(2, 5)) > 0.2
        valid[:, 0] = True  # centers always labeled
        dev = T.render_all_targets(
            jnp.asarray(points), jnp.asarray(p_C), jnp.asarray(valid),
            config, (64, 64),
        )
        host = T.render_all_targets_host(points, p_C, valid, config, (64, 64))
        for d, h in zip(dev, host):
            np.testing.assert_allclose(np.asarray(d), h, atol=1e-5)
