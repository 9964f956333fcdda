"""CornerNet decode parity against a torch restatement of the vendored
_decode (core/models/py_utils/utils.py:39-129). torch (CPU) is in the
image, so the exact reference math — topk tie-breaking included — can be
re-expressed and compared on random heads.

FALLBACK tier: the authoritative gate is tests/test_reference_parity.py
::TestDecodeReal, which runs the reference's real _decode; this restatement
remains for environments without the reference tree."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from object_keypoints_tpu.ops.detection_decode import decode_detections


def _torch_decode(tl_heat, br_heat, tl_tag, br_tag, tl_regr, br_regr,
                  K=20, ae_threshold=1.0, num_dets=50):
    """Reference math, NCHW torch (utils.py:39-129, kernel=1 path)."""
    import torch.nn as nn

    def gather_feat(feat, ind):
        dim = feat.size(2)
        ind = ind.unsqueeze(2).expand(ind.size(0), ind.size(1), dim)
        return feat.gather(1, ind)

    def tr_gather(feat, ind):
        feat = feat.permute(0, 2, 3, 1).contiguous()
        feat = feat.view(feat.size(0), -1, feat.size(3))
        return gather_feat(feat, ind)

    batch, cat, height, width = tl_heat.size()
    tl_heat = torch.sigmoid(tl_heat)
    br_heat = torch.sigmoid(br_heat)

    def topk(scores, K):
        topk_scores, topk_inds = torch.topk(scores.view(batch, -1), K)
        topk_clses = torch.div(topk_inds, height * width, rounding_mode="floor").int()
        topk_inds = topk_inds % (height * width)
        topk_ys = torch.div(topk_inds, width, rounding_mode="floor").int().float()
        topk_xs = (topk_inds % width).int().float()
        return topk_scores, topk_inds, topk_clses, topk_ys, topk_xs

    tl_scores, tl_inds, tl_clses, tl_ys, tl_xs = topk(tl_heat, K)
    br_scores, br_inds, br_clses, br_ys, br_xs = topk(br_heat, K)

    tl_ys = tl_ys.view(batch, K, 1).expand(batch, K, K)
    tl_xs = tl_xs.view(batch, K, 1).expand(batch, K, K)
    br_ys = br_ys.view(batch, 1, K).expand(batch, K, K)
    br_xs = br_xs.view(batch, 1, K).expand(batch, K, K)

    tl_regr_g = tr_gather(tl_regr, tl_inds).view(batch, K, 1, 2)
    br_regr_g = tr_gather(br_regr, br_inds).view(batch, 1, K, 2)
    tl_xs = tl_xs + tl_regr_g[..., 0]
    tl_ys = tl_ys + tl_regr_g[..., 1]
    br_xs = br_xs + br_regr_g[..., 0]
    br_ys = br_ys + br_regr_g[..., 1]

    bboxes = torch.stack((tl_xs, tl_ys, br_xs, br_ys), dim=3)
    tl_tag_g = tr_gather(tl_tag, tl_inds).view(batch, K, 1)
    br_tag_g = tr_gather(br_tag, br_inds).view(batch, 1, K)
    dists = torch.abs(tl_tag_g - br_tag_g)

    scores = (tl_scores.view(batch, K, 1).expand(batch, K, K)
              + br_scores.view(batch, 1, K).expand(batch, K, K)) / 2

    tl_clses_e = tl_clses.view(batch, K, 1).expand(batch, K, K)
    br_clses_e = br_clses.view(batch, 1, K).expand(batch, K, K)
    scores[tl_clses_e != br_clses_e] = -1
    scores[dists > ae_threshold] = -1
    scores[br_xs < tl_xs] = -1
    scores[br_ys < tl_ys] = -1

    scores = scores.view(batch, -1)
    scores, inds = torch.topk(scores, num_dets)
    scores = scores.unsqueeze(2)
    bboxes = gather_feat(bboxes.view(batch, -1, 4), inds)
    clses = gather_feat(tl_clses_e.contiguous().view(batch, -1, 1), inds).float()
    tl_s = gather_feat(
        tl_scores.view(batch, K, 1).expand(batch, K, K).contiguous().view(batch, -1, 1), inds
    )
    br_s = gather_feat(
        br_scores.view(batch, 1, K).expand(batch, K, K).contiguous().view(batch, -1, 1), inds
    )
    return torch.cat([bboxes, scores, tl_s, br_s, clses], dim=2)


class TestDecodeParity:
    def test_matches_torch_restatement(self):
        rng = np.random.default_rng(0)
        b, c, h, w = 2, 3, 16, 16
        # well-separated logits avoid top-k tie-order ambiguity between libs
        tl = rng.normal(scale=3.0, size=(b, c, h, w)).astype(np.float32)
        br = rng.normal(scale=3.0, size=(b, c, h, w)).astype(np.float32)
        tl_tag = rng.normal(size=(b, 1, h, w)).astype(np.float32)
        br_tag = rng.normal(size=(b, 1, h, w)).astype(np.float32)
        tl_off = rng.normal(scale=0.3, size=(b, 2, h, w)).astype(np.float32)
        br_off = rng.normal(scale=0.3, size=(b, 2, h, w)).astype(np.float32)

        ref = _torch_decode(
            torch.tensor(tl), torch.tensor(br), torch.tensor(tl_tag),
            torch.tensor(br_tag), torch.tensor(tl_off), torch.tensor(br_off),
            K=20, ae_threshold=1.0, num_dets=50,
        ).numpy()

        def nhwc(x):
            return jnp.asarray(np.transpose(x, (0, 2, 3, 1)))

        ours = np.asarray(
            decode_detections(
                nhwc(tl), nhwc(br), nhwc(tl_tag), nhwc(br_tag),
                nhwc(tl_off), nhwc(br_off), K=20, ae_threshold=1.0, num_dets=50,
            )
        )

        # compare as sets ordered by score (tie order among equal scores may
        # differ); scores must match elementwise after sorting
        np.testing.assert_allclose(
            np.sort(ours[..., 4], axis=1), np.sort(ref[..., 4], axis=1), atol=1e-5
        )
        # the positive-score detections must match as (box, class) multisets
        for n in range(b):
            ours_pos = ours[n][ours[n, :, 4] > 0]
            ref_pos = ref[n][ref[n, :, 4] > 0]
            assert ours_pos.shape == ref_pos.shape
            key = lambda a: a[np.lexsort((a[:, 0], a[:, 1], a[:, 4]))]
            np.testing.assert_allclose(key(ours_pos), key(ref_pos), atol=1e-4)
