"""Pallas kernel numerics (interpret mode on CPU)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from object_keypoints_tpu.ops.pallas import stem_conv as sc


class TestStemConvParity:
    def test_rearrangement_is_exact(self):
        """s2d + tap matrix must reproduce the strided 7x7 conv exactly."""
        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(2, 64, 64, 3)).astype(np.float32))
        w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1)
        scale = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(8,)).astype(np.float32))

        ref = sc.stem_conv_reference(x, w7, scale, bias)

        xs = sc.space_to_depth(x)
        taps = jnp.asarray(sc.rearrange_stem_kernel(np.asarray(w7)))
        out = sc.fused_stem_conv(xs, taps, scale, bias, rows_per_strip=8,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_odd_frame_padding(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(size=(1, 63, 63, 3)).astype(np.float32))
        w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32) * 0.1)
        scale = jnp.ones((8,), jnp.float32)
        bias = jnp.zeros((8,), jnp.float32)
        # pad to 64 then compare against the reference on the padded frame
        xp = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        ref = sc.stem_conv_reference(xp, w7, scale, bias)

        with jax.disable_jit():  # interpret path under the helper
            xs = sc.space_to_depth(xp)
            taps = jnp.asarray(sc.rearrange_stem_kernel(np.asarray(w7)))
            out = sc.fused_stem_conv(xs, taps, scale, bias, rows_per_strip=8,
                                     interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)

    def test_relu_and_bn_fold(self):
        rng = np.random.default_rng(2)
        x = jnp.asarray(rng.normal(size=(1, 32, 32, 3)).astype(np.float32))
        w7 = jnp.asarray(rng.normal(size=(7, 7, 3, 8)).astype(np.float32))
        scale = jnp.full((8,), 0.5, jnp.float32)
        bias = jnp.full((8,), -1.0, jnp.float32)
        xs = sc.space_to_depth(x)
        taps = jnp.asarray(sc.rearrange_stem_kernel(np.asarray(w7)))
        out = np.asarray(
            sc.fused_stem_conv(xs, taps, scale, bias, rows_per_strip=8, interpret=True)
        )
        assert (out >= 0).all()  # relu applied
        ref = np.asarray(sc.stem_conv_reference(x, w7, scale, bias))
        np.testing.assert_allclose(out, ref, atol=1e-4)
