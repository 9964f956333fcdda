"""C++ data-plane parity tests: native implementations must match the
device/numpy renderers bit-for-bit (within fp tolerance)."""

import numpy as np
import pytest
import jax.numpy as jnp

from object_keypoints_tpu.data import native
from object_keypoints_tpu.data import targets as T


requires_native = pytest.mark.skipif(
    not native.have_native(), reason="libokt_native.so unavailable and no compiler"
)


@requires_native
class TestNativeParity:
    def test_splat_matches_device(self):
        rng = np.random.default_rng(0)
        pts = rng.uniform(-5, 69, size=(7, 2)).astype(np.float32)
        ref = np.asarray(
            T.splat_gaussian((64, 64), jnp.asarray(pts), jnp.ones(7, bool))
        )
        out = native.splat_gaussian(np.zeros((64, 64), np.float32), pts)
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_add_discrete_kernel_matches_numpy(self):
        kernel = T.compute_kernel(50, 25)
        rng = np.random.default_rng(1)
        pts = rng.uniform(-20, 140, size=(6, 2))
        ref = T.add_discrete_kernel(np.zeros((120, 160), np.float32), kernel, pts, center=25)
        out = native.add_discrete_kernel(np.zeros((120, 160), np.float32), kernel, pts, center=25)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_normalize_matches_numpy(self):
        rng = np.random.default_rng(2)
        img = rng.integers(0, 256, size=(33, 47, 3), dtype=np.uint8)
        mean = np.array([0.4, 0.45, 0.47], np.float32)
        std = np.array([0.28, 0.27, 0.29], np.float32)
        ref = (img.astype(np.float32) / 255.0 - mean) / std
        out = native.normalize_image(img, mean, std)
        np.testing.assert_allclose(out, ref, atol=1e-6)

    def test_fill_discs_matches_device_depth(self):
        pts = np.array([[20.0, 20.0], [40.5, 10.25]], np.float32)
        vals = np.array([[1.5], [2.5]], np.float32)
        out = native.fill_discs(np.zeros((1, 64, 64), np.float32), pts, vals, radius=4.0)
        ref = np.asarray(
            T.render_depth_field(
                jnp.asarray(pts[None]),
                jnp.concatenate([jnp.asarray(pts[None]), jnp.asarray(vals[None])], axis=-1),
                jnp.ones((1, 2), bool), (2,), (64, 64),
            )
        )
        # device renderer loops keypoints within one map; both points in map 0
        np.testing.assert_allclose(out[0], ref[0], atol=1e-6)

    def test_splat_fallback_equals_native(self):
        rng = np.random.default_rng(3)
        pts = rng.uniform(0, 60, size=(4, 2)).astype(np.float32)
        a = native.splat_gaussian(np.zeros((64, 64), np.float32), pts)
        # force the numpy fallback path
        saved = native._lib
        native._lib = False
        try:
            b = native.splat_gaussian(np.zeros((64, 64), np.float32), pts)
        finally:
            native._lib = saved
        np.testing.assert_allclose(a, b, atol=1e-5)
