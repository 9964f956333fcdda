"""Vendored-surface tests: corner pooling, box NMS family, CornerNet model
family + detection decode."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from object_keypoints_tpu.ops import corner_pool as cp
from object_keypoints_tpu.ops import nms as nms_ops
from object_keypoints_tpu.ops.detection_decode import decode_detections, topk_corners


class TestCornerPool:
    def _x(self):
        rng = np.random.default_rng(0)
        return jnp.asarray(rng.normal(size=(2, 6, 5, 3)).astype(np.float32))

    def test_directions(self):
        x = self._x()
        xn = np.asarray(x)
        # suffix/prefix running max along H / W (top_pool.cpp semantics)
        top = np.maximum.accumulate(xn[:, ::-1], axis=1)[:, ::-1]
        bottom = np.maximum.accumulate(xn, axis=1)
        left = np.maximum.accumulate(xn[:, :, ::-1], axis=2)[:, :, ::-1]
        right = np.maximum.accumulate(xn, axis=2)
        np.testing.assert_allclose(np.asarray(cp.top_pool(x)), top)
        np.testing.assert_allclose(np.asarray(cp.bottom_pool(x)), bottom)
        np.testing.assert_allclose(np.asarray(cp.left_pool(x)), left)
        np.testing.assert_allclose(np.asarray(cp.right_pool(x)), right)

    def test_gradient_scatters_to_argmax(self):
        """The C++ backward scatter-adds to the running argmax
        (top_pool.cpp:28-69); autodiff of cummax must do the same."""
        x = jnp.asarray([[0.0], [3.0], [1.0], [2.0]])[None, :, :, None]  # (1,4,1,1)

        def f(x):
            return jnp.sum(cp.top_pool(x) * jnp.asarray([1.0, 1.0, 1.0, 1.0])[None, :, None, None])

        g = np.asarray(jax.grad(f)(x))[0, :, 0, 0]
        # top_pool: rows 0,1 take max from row 1 (value 3); rows 2,3 take own/row3
        np.testing.assert_allclose(g, [0.0, 2.0, 0.0, 2.0])

    def test_module_aliases(self):
        x = self._x()
        np.testing.assert_allclose(
            np.asarray(cp.TopPool()(x)), np.asarray(cp.top_pool(x))
        )


def _numpy_greedy_nms(dets, threshold):
    """Direct restatement of the Cython greedy loop (nms.pyx:17-69)."""
    order = np.argsort(-dets[:, 4], kind="stable")
    keep = []
    suppressed = np.zeros(len(dets), bool)
    for _i in range(len(dets)):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, len(dets)):
            j = order[_j]
            if suppressed[j]:
                continue
            iou = np.asarray(
                nms_ops.bbox_overlaps(dets[None, i, :4], dets[None, j, :4])
            )[0, 0]
            if iou > threshold:
                suppressed[j] = True
    return sorted(keep)


class TestNMS:
    def _dets(self, n=24, seed=1):
        rng = np.random.default_rng(seed)
        xy = rng.uniform(0, 80, size=(n, 2))
        wh = rng.uniform(5, 40, size=(n, 2))
        scores = rng.uniform(0.1, 1.0, size=(n, 1))
        return np.concatenate([xy, xy + wh, scores], axis=1).astype(np.float32)

    def test_greedy_matches_reference_restatement(self):
        dets = self._dets()
        keep = np.asarray(nms_ops.nms_mask(jnp.asarray(dets), 0.5))
        ref = _numpy_greedy_nms(dets, 0.5)
        assert sorted(np.nonzero(keep)[0].tolist()) == ref

    def test_bbox_overlaps_self(self):
        dets = self._dets(8)
        iou = np.asarray(nms_ops.bbox_overlaps(dets[:, :4], dets[:, :4]))
        np.testing.assert_allclose(np.diag(iou), 1.0, atol=1e-6)
        assert (iou <= 1.0 + 1e-6).all() and (iou >= 0).all()

    def test_soft_nms_decays_overlaps(self):
        a = np.array([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [50, 50, 60, 60, 0.7]],
                     np.float32)
        out = np.asarray(nms_ops.soft_nms(jnp.asarray(a), method=2))
        assert out[0, 4] == pytest.approx(0.9)  # top box untouched
        assert out[1, 4] < 0.8  # overlapping box decayed
        assert out[2, 4] == pytest.approx(0.7, abs=1e-6)  # distant box kept

    def test_soft_nms_merge_moves_box(self):
        a = np.array([[0, 0, 10, 10, 0.9], [2, 2, 12, 12, 0.85]], np.float32)
        out = np.asarray(nms_ops.soft_nms_merge(jnp.asarray(a), method=2))
        # merged coordinates move toward the absorbed box
        assert 0.0 < out[0, 0] < 2.0
        assert out[0, 2] > 10.0

    def test_soft_nms_batch_matches_per_class_calls(self):
        """The single-dispatch class-batched program (what the inference
        drivers use) must equal per-class soft_nms calls, with PAD_BOX
        filler rows inert."""
        per_class = [self._dets(n, seed=s) for n, s in ((24, 1), (7, 2), (0, 3))]
        padded = nms_ops.pad_class_dets(per_class, 32)
        out = np.asarray(nms_ops.soft_nms_batch(jnp.asarray(padded), method=2))
        for j, d in enumerate(per_class):
            ref = np.asarray(nms_ops.soft_nms(jnp.asarray(d), method=2)) \
                if len(d) else np.zeros((0, 5), np.float32)
            np.testing.assert_allclose(out[j, : len(d)], ref, rtol=1e-6, atol=1e-6)
            # filler rows never gain score
            assert (out[j, len(d):, 4] == 0).all()

    def test_soft_nms_merge_batch_matches_per_class_calls(self):
        rng = np.random.default_rng(7)
        per_class = []
        for n in (12, 5):
            d5 = self._dets(n, seed=n)
            corners = rng.uniform(0.1, 1.0, size=(n, 2)).astype(np.float32)
            per_class.append(np.concatenate([d5, corners], axis=1))
        padded = nms_ops.pad_class_dets(per_class, 16, width=7)
        out = np.asarray(nms_ops.soft_nms_merge_batch(jnp.asarray(padded),
                                                      method=2))
        for j, d in enumerate(per_class):
            ref = np.asarray(nms_ops.soft_nms_merge(jnp.asarray(d), method=2))
            np.testing.assert_allclose(out[j, : len(d)], ref, rtol=1e-5,
                                       atol=1e-5)


class TestDecode:
    def test_topk_corners_layout(self):
        rng = np.random.default_rng(2)
        scores = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
        s, pix, cls, ys, xs = topk_corners(scores, 5)
        flat = np.transpose(np.asarray(scores), (0, 3, 1, 2)).reshape(1, -1)
        np.testing.assert_allclose(np.asarray(s)[0], np.sort(flat[0])[::-1][:5], rtol=1e-6)
        # coordinates must point back at the scores
        for k in range(5):
            c, y, x = int(cls[0, k]), int(ys[0, k]), int(xs[0, k])
            assert scores[0, y, x, c] == s[0, k]

    def test_decode_recovers_planted_box(self):
        """Plant one tl/br corner pair with matching tags -> the decoder's
        top detection must be that box with the right class."""
        h = w = 16
        cats = 3
        tl = np.full((1, h, w, cats), -10.0, np.float32)
        br = np.full((1, h, w, cats), -10.0, np.float32)
        tl[0, 3, 4, 1] = 10.0  # (y=3, x=4), class 1
        br[0, 10, 12, 1] = 10.0
        tags_tl = np.zeros((1, h, w, 1), np.float32)
        tags_br = np.zeros((1, h, w, 1), np.float32)
        offs = np.zeros((1, h, w, 2), np.float32)
        offs_tl = offs.copy()
        offs_tl[0, 3, 4] = [0.25, 0.5]

        dets = np.asarray(
            decode_detections(
                jnp.asarray(tl), jnp.asarray(br), jnp.asarray(tags_tl),
                jnp.asarray(tags_br), jnp.asarray(offs_tl), jnp.asarray(offs),
                K=10, num_dets=5,
            )
        )
        top = dets[0, 0]
        np.testing.assert_allclose(top[:4], [4.25, 3.5, 12.0, 10.0], atol=1e-5)
        assert top[7] == 1.0  # class
        assert top[4] > 0.9  # score ~ sigmoid(10)

    def test_decode_rejects_inverted_and_mismatched(self):
        h = w = 8
        tl = np.full((1, h, w, 2), -10.0, np.float32)
        br = np.full((1, h, w, 2), -10.0, np.float32)
        tl[0, 6, 6, 0] = 10.0  # tl *below-right of* br -> inverted geometry
        br[0, 2, 2, 0] = 10.0
        tl[0, 1, 1, 1] = 10.0  # class-1 tl, no class-1 br
        zeros1 = np.zeros((1, h, w, 1), np.float32)
        zeros2 = np.zeros((1, h, w, 2), np.float32)
        dets = np.asarray(
            decode_detections(
                jnp.asarray(tl), jnp.asarray(br), jnp.asarray(zeros1),
                jnp.asarray(zeros1), jnp.asarray(zeros2), jnp.asarray(zeros2),
                K=5, num_dets=5,
            )
        )
        # every pairing involving a strong corner is rejected -> scores low
        assert (dets[0, :, 4] < 0.6).all()


TINY_KW = dict(categories=4, dtype=jnp.float32)


class TestCornerNetModels:
    def _tiny(self, factory_kwargs):
        from object_keypoints_tpu.models.cornernet import CornerNetModel

        return CornerNetModel(**factory_kwargs)

    def test_squeeze_train_outputs(self):
        m = self._tiny(dict(
            categories=4, stacks=2, levels=2, dims=(16, 16, 32), mods=(1, 1, 1),
            hourglass="fire", stem_residuals=2, cnv_dim=16,
        ))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.key(0)}, x)
        outs = m.apply(v, x)
        assert len(outs) == 6
        tl_heats = outs[0]
        assert len(tl_heats) == 2
        assert tl_heats[0].shape == (1, 8, 8, 4)
        # heat bias init -2.19
        bias = v["params"]["tl_heat_0"]["conv_out"]["bias"]
        np.testing.assert_allclose(np.asarray(bias), -2.19, rtol=1e-6)

    def test_residual_variant_runs(self):
        m = self._tiny(dict(
            categories=4, stacks=1, levels=2, dims=(16, 16, 32), mods=(1, 1, 1),
            hourglass="residual", stem_residuals=1, cnv_dim=16,
        ))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.key(0)}, x)
        outs = m.apply(v, x)
        assert outs[0][0].shape == (1, 16, 16, 4)  # 2-stage stem: /4

    def test_saccade_attention_outputs(self):
        m = self._tiny(dict(
            categories=4, stacks=2, levels=2, dims=(16, 16, 32), mods=(1, 1, 1),
            hourglass="residual", stem_residuals=1, cnv_dim=16,
            with_attention=True,
        ))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.key(0)}, x)
        outs = m.apply(v, x)
        assert len(outs) == 7
        atts = outs[6]
        assert len(atts) == 2  # per stack
        assert len(atts[0]) == 2  # per hourglass level
        assert atts[0][0].shape[-1] == 1

    def test_test_mode_decodes(self):
        m = self._tiny(dict(
            categories=4, stacks=1, levels=2, dims=(16, 16, 32), mods=(1, 1, 1),
            hourglass="fire", stem_residuals=2, cnv_dim=16,
        ))
        x = jnp.zeros((1, 64, 64, 3))
        v = m.init({"params": jax.random.key(0)}, x)
        dets, tl_heat, br_heat, tl_tag, br_tag = m.apply(
            v, x, False, True, K=10, num_dets=8
        )
        assert dets.shape == (1, 8, 8)
        assert tl_heat.shape == (1, 8, 8, 4)

    def test_full_size_factories_build(self):
        from object_keypoints_tpu.models.cornernet import (
            cornernet,
            cornernet_saccade,
            cornernet_squeeze,
        )

        for factory, in_size in ((cornernet, 511), (cornernet_squeeze, 511),
                                 (cornernet_saccade, 255)):
            m = factory()
            x = jnp.zeros((1, in_size, in_size, 3))
            shapes = jax.eval_shape(lambda m=m, x=x: m.init({"params": jax.random.key(0)}, x))
            n_params = sum(
                int(np.prod(p.shape)) for p in jax.tree_util.tree_leaves(shapes["params"])
            )
            assert n_params > 1e6
