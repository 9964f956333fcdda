"""Loss parity tests against a torch re-statement of the reference math.

torch (CPU) is available in the image, so the reference loss semantics
(perception/loss.py:19-48, corner_net_lite losses.py:35-95) are re-expressed
in torch here and our jax losses are gated against them on values AND
gradients.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from object_keypoints_tpu.training.losses import (  # noqa: E402
    KeypointLoss,
    ae_loss,
    focal_loss,
    keypoint_loss,
    offset_loss,
)


def _torch_keypoint_loss(p_heatmaps, gt_heatmaps, p_depth, gt_depth, p_centers,
                         gt_centers, depth_weight=10.0, center_weight=1.0):
    """Reference math (loss.py:19-48), NCHW torch."""
    heatmap_loss = 0.0
    depth_loss = 0.0
    center_loss = 0.0
    N = float(gt_heatmaps.shape[0])
    for p_hm, p_d, p_center in zip(p_heatmaps, p_depth, p_centers):
        heatmap_loss = heatmap_loss + F.binary_cross_entropy_with_logits(
            p_hm, gt_heatmaps, reduction="none"
        ).sum(dim=[1, 2, 3]).mean()
        where_heat = gt_heatmaps > 0.01
        depth_loss = depth_loss + F.l1_loss(
            p_d[where_heat], gt_depth[where_heat], reduction="sum"
        ) / N
        mask = where_heat[:, 1:, None].expand(-1, -1, 2, -1, -1)
        center_loss = center_loss + F.smooth_l1_loss(
            p_center[mask], gt_centers[mask], reduction="sum"
        ) / N
    return heatmap_loss + depth_weight * depth_loss + center_weight * center_loss


def _rand(rng, shape):
    return rng.normal(size=shape).astype(np.float32)


class TestKeypointLossParity:
    def _fixture(self, seed=0, n=3, k=4, h=8, w=8):
        rng = np.random.default_rng(seed)
        t = k - 1
        p_heat = [_rand(rng, (n, k, h, w)) for _ in range(2)]
        gt_heat = rng.uniform(size=(n, k, h, w)).astype(np.float32)
        # make the mask pattern interesting: zero out most of gt
        gt_heat = np.where(gt_heat > 0.7, gt_heat, 0.0).astype(np.float32)
        p_depth = [_rand(rng, (n, k, h, w)) for _ in range(2)]
        gt_depth = rng.uniform(0.5, 2.0, size=(n, k, h, w)).astype(np.float32)
        p_centers = [_rand(rng, (n, t, 2, h, w)) for _ in range(2)]
        gt_centers = _rand(rng, (n, t, 2, h, w))
        return p_heat, gt_heat, p_depth, gt_depth, p_centers, gt_centers

    @staticmethod
    def _to_nhwc(arrs):
        """NCHW -> NHWC; center fields (N,T,2,H,W) -> (N,H,W,T,2)."""
        out = []
        for a in arrs:
            if a.ndim == 4:
                out.append(np.transpose(a, (0, 2, 3, 1)))
            else:
                out.append(np.transpose(a, (0, 3, 4, 1, 2)))
        return out

    def test_value_parity(self):
        fix = self._fixture()
        p_heat, gt_heat, p_depth, gt_depth, p_centers, gt_centers = fix

        ref = _torch_keypoint_loss(
            [torch.tensor(x) for x in p_heat], torch.tensor(gt_heat),
            [torch.tensor(x) for x in p_depth], torch.tensor(gt_depth),
            [torch.tensor(x) for x in p_centers], torch.tensor(gt_centers),
        ).item()

        ph, gh = self._to_nhwc(p_heat), self._to_nhwc([gt_heat])[0]
        pd, gd = self._to_nhwc(p_depth), self._to_nhwc([gt_depth])[0]
        pc, gc = self._to_nhwc(p_centers), self._to_nhwc([gt_centers])[0]
        ours, hm, dl, cl = keypoint_loss(
            [jnp.asarray(x) for x in ph], jnp.asarray(gh),
            [jnp.asarray(x) for x in pd], jnp.asarray(gd),
            [jnp.asarray(x) for x in pc], jnp.asarray(gc),
        )
        np.testing.assert_allclose(float(ours), ref, rtol=2e-5)
        assert len(hm) == len(dl) == len(cl) == 2

    def test_gradient_parity(self):
        fix = self._fixture(seed=1)
        p_heat, gt_heat, p_depth, gt_depth, p_centers, gt_centers = fix

        tp_heat = [torch.tensor(x, requires_grad=True) for x in p_heat]
        tp_depth = [torch.tensor(x, requires_grad=True) for x in p_depth]
        tp_centers = [torch.tensor(x, requires_grad=True) for x in p_centers]
        ref = _torch_keypoint_loss(
            tp_heat, torch.tensor(gt_heat), tp_depth, torch.tensor(gt_depth),
            tp_centers, torch.tensor(gt_centers),
        )
        ref.backward()

        ph, gh = self._to_nhwc(p_heat), self._to_nhwc([gt_heat])[0]
        pd, gd = self._to_nhwc(p_depth), self._to_nhwc([gt_depth])[0]
        pc, gc = self._to_nhwc(p_centers), self._to_nhwc([gt_centers])[0]

        def f(ph0, pd0, pc0):
            total, *_ = keypoint_loss(
                [ph0, jnp.asarray(ph[1])], jnp.asarray(gh),
                [pd0, jnp.asarray(pd[1])], jnp.asarray(gd),
                [pc0, jnp.asarray(pc[1])], jnp.asarray(gc),
            )
            return total

        g_heat, g_depth, g_centers = jax.grad(f, argnums=(0, 1, 2))(
            jnp.asarray(ph[0]), jnp.asarray(pd[0]), jnp.asarray(pc[0])
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(g_heat), (0, 3, 1, 2)),
            tp_heat[0].grad.numpy(), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(g_depth), (0, 3, 1, 2)),
            tp_depth[0].grad.numpy(), atol=1e-5,
        )
        np.testing.assert_allclose(
            np.transpose(np.asarray(g_centers), (0, 3, 4, 1, 2)),
            tp_centers[0].grad.numpy(), atol=1e-5,
        )

    def test_class_wrapper_validates_reduction(self):
        with pytest.raises(NotImplementedError):
            KeypointLoss([1, 3], reduction="max")


class TestCornerNetLosses:
    def test_focal_loss_parity(self):
        rng = np.random.default_rng(2)
        gt = rng.uniform(size=(2, 3, 8, 8)).astype(np.float32)
        gt = np.where(gt > 0.95, 1.0, gt * 0.9).astype(np.float32)
        pred = rng.uniform(0.05, 0.95, size=(2, 3, 8, 8)).astype(np.float32)

        # torch restatement of losses.py:73-95
        tpred = torch.tensor(pred)
        tgt = torch.tensor(gt)
        pos = tgt.eq(1)
        neg = tgt.lt(1)
        neg_w = torch.pow(1 - tgt[neg], 4)
        pos_loss = (torch.log(tpred[pos]) * torch.pow(1 - tpred[pos], 2)).sum()
        neg_loss = (torch.log(1 - tpred[neg]) * torch.pow(tpred[neg], 2) * neg_w).sum()
        num_pos = pos.float().sum()
        ref = -(pos_loss + neg_loss) / num_pos

        ours = focal_loss([jnp.asarray(pred)], jnp.asarray(gt))
        np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)

    def test_offset_loss_parity(self):
        rng = np.random.default_rng(3)
        off = _rand(rng, (2, 5, 2))
        gt = _rand(rng, (2, 5, 2))
        mask = rng.uniform(size=(2, 5)) > 0.4

        toff, tgt = torch.tensor(off), torch.tensor(gt)
        tmask = torch.tensor(mask).unsqueeze(2).expand_as(tgt)
        num = torch.tensor(mask).float().sum()
        ref = F.smooth_l1_loss(toff[tmask], tgt[tmask], reduction="sum") / (num + 1e-4)

        ours = offset_loss(jnp.asarray(off), jnp.asarray(gt), jnp.asarray(mask))
        np.testing.assert_allclose(float(ours), ref.item(), rtol=1e-5)

    def test_ae_loss_pull_zero_for_identical_tags(self):
        tags = jnp.ones((2, 4))
        mask = jnp.ones((2, 4), bool)
        pull, push = ae_loss(tags, tags, mask)
        np.testing.assert_allclose(float(pull), 0.0, atol=1e-6)
        assert float(push) > 0.0  # identical tags repel


class TestSaccadeLoss:
    def test_masked_focal_reduces_to_unmasked(self):
        rng = np.random.default_rng(5)
        gt = rng.uniform(size=(1, 4, 4, 2)).astype(np.float32)
        gt = np.where(gt > 0.9, 1.0, gt * 0.8).astype(np.float32)
        pred = rng.uniform(0.1, 0.9, size=(1, 4, 4, 2)).astype(np.float32)
        from object_keypoints_tpu.training.losses import focal_loss_masked

        full = focal_loss_masked([jnp.asarray(pred)], jnp.asarray(gt),
                                 jnp.ones_like(jnp.asarray(gt)))
        plain = focal_loss([jnp.asarray(pred)], jnp.asarray(gt))
        np.testing.assert_allclose(float(full), float(plain), rtol=1e-6)
        # zero validity kills the positive/negative contributions
        none = focal_loss_masked([jnp.asarray(pred)], jnp.asarray(gt),
                                 jnp.zeros_like(jnp.asarray(gt)))
        np.testing.assert_allclose(float(none), 0.0, atol=1e-6)

    def test_saccade_loss_runs_and_is_finite(self):
        from object_keypoints_tpu.training.losses import cornernet_saccade_loss

        rng = np.random.default_rng(6)
        n, h, w, c, m = 1, 8, 8, 2, 4
        heats = [jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))]
        gt_heat = jnp.asarray(
            np.where(rng.uniform(size=(n, h, w, c)) > 0.95, 1.0, 0.3).astype(np.float32)
        )
        tags = [jnp.asarray(rng.normal(size=(n, m)).astype(np.float32))]
        offs = [jnp.asarray(rng.normal(size=(n, m, 2)).astype(np.float32))]
        mask = jnp.asarray(np.array([[1, 1, 0, 0]], bool))
        valid = jnp.ones((n, h, w, c))
        atts = [[jnp.asarray(rng.normal(size=(n, 4, 4, 1)).astype(np.float32))]]
        gt_atts = [jnp.asarray(
            np.where(rng.uniform(size=(n, 4, 4, 1)) > 0.9, 1.0, 0.0).astype(np.float32)
        )]
        loss = cornernet_saccade_loss(
            (heats, heats, tags, tags, offs, offs, atts),
            (gt_heat, gt_heat, mask, offs[0], offs[0], valid, valid, gt_atts),
        )
        assert np.isfinite(float(loss))
