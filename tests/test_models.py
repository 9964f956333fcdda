"""Model architecture tests: shapes, stem arithmetic, head init quirks,
mutation of BN state, and a tiny-config forward through the full stack."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from object_keypoints_tpu.models import (
    ConvBlock,
    FireModule,
    HourglassStack,
    KeypointNet,
    Residual,
)

TINY = dict(
    levels=2,
    dims=(16, 16, 32),
    mods=(1, 1, 1),
    stem_features=(8, 16),
    cnv_dim=16,
)


class TestBlocks:
    def test_conv_block_stride_arithmetic(self):
        """torch conv k7 s2 p3 on 511 -> 256 (CornerNet_Squeeze.py:66-72)."""
        m = ConvBlock(4, kernel=7, stride=2)
        x = jnp.zeros((1, 511, 511, 3))
        v = m.init(jax.random.key(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 256, 256, 4)

    def test_residual_projection(self):
        m = Residual(8, stride=2)
        x = jnp.ones((1, 16, 16, 4))
        v = m.init(jax.random.key(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 8, 8, 8)
        assert (np.asarray(y) >= 0).all()  # final relu

    def test_fire_module_skip(self):
        m = FireModule(16)
        x = jnp.ones((1, 8, 8, 16))
        v = m.init(jax.random.key(0), x)
        y = m.apply(v, x)
        assert y.shape == x.shape

    def test_fire_module_stride(self):
        m = FireModule(32, stride=2)
        x = jnp.ones((1, 8, 8, 16))
        v = m.init(jax.random.key(0), x)
        y = m.apply(v, x)
        assert y.shape == (1, 4, 4, 32)


class TestHourglass:
    def test_stack_output_shapes(self):
        m = HourglassStack(stacks=2, **TINY)
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init(jax.random.key(0), x)
        outs = m.apply(v, x)
        assert len(outs) == 2
        for o in outs:
            assert o.shape == (1, 8, 8, TINY["cnv_dim"])  # 64 / 8 = 8

    def test_batchnorm_state_updates_in_train(self):
        m = HourglassStack(stacks=1, **TINY)
        x = jax.random.normal(jax.random.key(1), (2, 32, 32, 3))
        v = m.init(jax.random.key(0), x)
        _, new_state = m.apply(v, x, True, mutable=["batch_stats"])
        before = jax.tree_util.tree_leaves(v["batch_stats"])
        after = jax.tree_util.tree_leaves(new_state["batch_stats"])
        changed = any(not np.allclose(b, a) for b, a in zip(before, after))
        assert changed


class TestKeypointNet:
    @pytest.fixture(scope="class")
    def net(self):
        model = KeypointNet(heatmaps_out=3, features=8, stacks=2, **TINY)
        x = jnp.zeros((1, 64, 64, 3))
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        return model, variables

    def test_output_shapes(self, net):
        model, variables = net
        x = jnp.zeros((2, 64, 64, 3))
        out = model.apply(variables, x, train=False)
        assert len(out.heatmaps) == 2
        for s in range(2):
            assert out.heatmaps[s].shape == (2, 8, 8, 3)
            assert out.depth[s].shape == (2, 8, 8, 3)
            assert out.centers[s].shape == (2, 8, 8, 2, 2)  # (K-1) types x 2

    def test_heatmap_bias_quirk(self, net):
        """Final heatmap-head bias must be 0.01/0.99 (models.py:25-26)."""
        _, variables = net
        bias = variables["params"]["heatmap_head_0"]["conv_out"]["bias"]
        np.testing.assert_allclose(np.asarray(bias), 0.01 / 0.99, rtol=1e-6)
        depth_bias = variables["params"]["depth_head_0"]["conv_out"]["bias"]
        np.testing.assert_allclose(np.asarray(depth_bias), 0.0)

    def test_dropout_only_in_train(self, net):
        model, variables = net
        x = jax.random.normal(jax.random.key(2), (1, 64, 64, 3))
        a = model.apply(variables, x, train=False)
        b = model.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(a.heatmaps[-1]), np.asarray(b.heatmaps[-1]))
        t1 = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.key(3)}, mutable=["batch_stats"],
        )[0]
        t2 = model.apply(
            variables, x, train=True,
            rngs={"dropout": jax.random.key(4)}, mutable=["batch_stats"],
        )[0]
        assert not np.allclose(np.asarray(t1.heatmaps[-1]), np.asarray(t2.heatmaps[-1]))

    def test_full_size_config_param_count(self):
        """The production config must build and have a plausible parameter
        count (CornerNet-Squeeze hourglass is ~30M params)."""
        model = KeypointNet(heatmaps_out=2)
        x = jnp.zeros((1, 511, 511, 3))  # eval_shape: no actual compute
        variables = jax.eval_shape(
            lambda: model.init({"params": jax.random.key(0)}, x, train=False)
        )
        n_params = sum(
            int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(variables["params"])
        )
        assert 5e6 < n_params < 60e6, n_params
