"""Training losses with exact reduction-structure parity.

Rebuild of perception/loss.py:5-48 (KeypointLoss) and the vendored
CornerNet losses (core/models/py_utils/losses.py: penalty-reduced focal,
associative-embedding pull/push, masked smooth-L1 offsets). The subtle
reduction structure is preserved so gradients match the reference
bit-for-bit in float64 (gated against torch in tests/test_losses.py):

- heatmap: BCE-with-logits, summed over (C, H, W), then batch-meaned
  (loss.py:32) — per stack, stacks summed;
- depth: L1 restricted to gt_heatmap > 0.01 pixels, sum / batch
  (loss.py:36-39);
- center: smooth-L1 on the mask of the K-1 non-center maps broadcast over
  the 2 offset channels, sum / batch (loss.py:42-44);
- total = heatmap + 10 * depth + 1 * center (defaults loss.py:6).

Layouts: this module takes NHWC ((N, H, W, K) heatmaps/depth and
(N, H, W, T, 2) centers) to match the Flax model; masking uses
where-multiplication instead of boolean gather so the whole loss jits with
static shapes.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, labels):
    """Numerically-stable elementwise BCE-with-logits (torch parity)."""
    # max(x, 0) - x * y + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * labels
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def _smooth_l1(x, y):
    """torch smooth_l1 (beta=1): 0.5 d^2 if |d| < 1 else |d| - 0.5."""
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def keypoint_loss(
    p_heatmaps: Sequence[jax.Array],
    gt_heatmaps: jax.Array,
    p_depth: Sequence[jax.Array],
    gt_depth: jax.Array,
    p_centers: Sequence[jax.Array],
    gt_centers: jax.Array,
    depth_weight: float = 10.0,
    center_weight: float = 1.0,
) -> Tuple[jax.Array, Tuple, Tuple, Tuple]:
    """Per-stack losses + weighted total (perception/loss.py:19-48).

    p_heatmaps/p_depth: per-stack (N, H, W, K); p_centers: per-stack
    (N, H, W, T, 2); gt_* single arrays of the same shapes. Returns
    (total, heatmap_losses, depth_losses, center_losses) where the per-stack
    lists carry the same values the reference logs (scripts/train.py:67-91).
    Note the reference appends the *unnormalized* depth/center sums to its
    lists while accumulating sum/N into the total (loss.py:36-44) — kept.
    """
    n = jnp.asarray(gt_heatmaps.shape[0], gt_heatmaps.dtype)
    where_heat = gt_heatmaps > 0.01  # (N, H, W, K)
    # centers mask: non-center maps broadcast over the 2 offset channels
    center_mask = where_heat[..., 1:, None]  # (N, H, W, T, 1)

    heatmap_total = 0.0
    depth_total = 0.0
    center_total = 0.0
    heatmap_losses, depth_losses, center_losses = [], [], []

    for p_hm, p_d, p_c in zip(p_heatmaps, p_depth, p_centers):
        hm = _bce_with_logits(p_hm, gt_heatmaps)
        hm = jnp.mean(jnp.sum(hm, axis=(1, 2, 3)))  # sum CHW, mean batch (loss.py:32)
        heatmap_total += hm
        heatmap_losses.append(hm)

        d = jnp.sum(jnp.where(where_heat, jnp.abs(p_d - gt_depth), 0.0))
        depth_total += d / n
        depth_losses.append(d)

        c = jnp.sum(jnp.where(center_mask, _smooth_l1(p_c, gt_centers), 0.0))
        center_total += c / n
        center_losses.append(c)

    total = heatmap_total + depth_weight * depth_total + center_weight * center_total
    return total, tuple(heatmap_losses), tuple(depth_losses), tuple(center_losses)


class KeypointLoss:
    """Object wrapper mirroring the reference ctor (loss.py:5-17)."""

    def __init__(self, keypoint_config, depth_weight: float = 10.0,
                 center_weight: float = 1.0, reduction: str = "mean"):
        if reduction not in ("mean", "sum"):
            raise NotImplementedError(
                f"Unknown reduction method {reduction}, try 'mean' or 'sum'."
            )
        self.keypoint_config = keypoint_config
        self.n_keypoint_maps = len(keypoint_config) + 1  # + center map
        self.depth_weight = depth_weight
        self.center_weight = center_weight

    def __call__(self, p_heatmaps, gt_heatmaps, p_depth, gt_depth, p_centers, gt_centers):
        return keypoint_loss(
            p_heatmaps, gt_heatmaps, p_depth, gt_depth, p_centers, gt_centers,
            depth_weight=self.depth_weight, center_weight=self.center_weight,
        )


# ---------------------------------------------------------------------------
# CornerNet losses (vendored-surface parity; losses.py:9-95)
# ---------------------------------------------------------------------------


def _clamped_sigmoid(x):
    """losses.py:6-7: sigmoid clamped into [1e-4, 1 - 1e-4]."""
    return jnp.clip(jax.nn.sigmoid(x), 1e-4, 1.0 - 1e-4)


def focal_loss(preds: Sequence[jax.Array], gt: jax.Array) -> jax.Array:
    """Penalty-reduced focal loss over *probabilities* (losses.py:73-95).

    pos (gt == 1): log(p) (1-p)^2; neg: log(1-p) p^2 (1-gt)^4; normalized by
    the positive count (falls back to the raw negative sum when there are no
    positives, like the reference's nelement()==0 branch).
    """
    pos = gt == 1.0
    neg = ~pos
    neg_weights = jnp.where(neg, (1.0 - gt) ** 4, 0.0)
    num_pos = jnp.sum(pos.astype(gt.dtype))

    total = 0.0
    for p in preds:
        pos_loss = jnp.sum(jnp.where(pos, jnp.log(p) * (1.0 - p) ** 2, 0.0))
        neg_loss = jnp.sum(jnp.where(neg, jnp.log(1.0 - p) * p**2 * neg_weights, 0.0))
        total = total - jnp.where(
            num_pos > 0, (pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0), neg_loss
        )
    return total


def focal_loss_masked(preds: Sequence[jax.Array], gt: jax.Array,
                      valid: jax.Array) -> jax.Array:
    """Validity-masked penalty-reduced focal loss (losses.py:46-71), used by
    the saccade trainer where crops carry per-pixel validity."""
    pos = gt == 1.0
    neg = ~pos
    neg_weights = jnp.where(neg, (1.0 - gt) ** 4, 0.0)
    num_pos = jnp.sum(pos.astype(gt.dtype))
    validf = valid.astype(gt.dtype)

    total = 0.0
    for p in preds:
        pos_loss = jnp.sum(
            jnp.where(pos, jnp.log(p) * (1.0 - p) ** 2 * validf, 0.0)
        )
        neg_loss = jnp.sum(
            jnp.where(neg, jnp.log(1.0 - p) * p**2 * neg_weights * validf, 0.0)
        )
        total = total - jnp.where(
            num_pos > 0, (pos_loss + neg_loss) / jnp.maximum(num_pos, 1.0), neg_loss
        )
    return total


def ae_loss(tag0: jax.Array, tag1: jax.Array, mask: jax.Array):
    """Associative-embedding pull/push on paired corner tags
    (losses.py:9-33). tag0/tag1: (N, M) gathered tag values; mask: (N, M)."""
    dtype = tag0.dtype
    maskf = mask.astype(dtype)
    num = jnp.sum(maskf, axis=1, keepdims=True)  # (N, 1)
    tag_mean = (tag0 + tag1) / 2.0

    pull0 = jnp.sum(jnp.where(mask, (tag0 - tag_mean) ** 2 / (num + 1e-4), 0.0))
    pull1 = jnp.sum(jnp.where(mask, (tag1 - tag_mean) ** 2 / (num + 1e-4), 0.0))
    pull = pull0 + pull1

    pair_mask = (maskf[:, :, None] + maskf[:, None, :]) == 2.0
    num2 = (num - 1.0) * num  # (N, 1)
    dist = tag_mean[:, :, None] - tag_mean[:, None, :]
    dist = jax.nn.relu(1.0 - jnp.abs(dist))
    dist = dist - 1.0 / (num[..., None] + 1e-4)
    dist = dist / (num2[..., None] + 1e-4)
    push = jnp.sum(jnp.where(pair_mask, dist, 0.0))
    return pull, push


def offset_loss(off: jax.Array, gt_off: jax.Array, mask: jax.Array) -> jax.Array:
    """Masked smooth-L1 sub-pixel offset loss (losses.py:35-44).
    off/gt_off: (N, M, 2); mask: (N, M)."""
    num = jnp.sum(mask.astype(off.dtype))
    loss = jnp.sum(jnp.where(mask[..., None], _smooth_l1(off, gt_off), 0.0))
    return loss / (num + 1e-4)


def cornernet_loss(outs, targets, pull_weight=1e-1, push_weight=1e-1, off_weight=1.0):
    """Combined CornerNet loss across stacks (losses.py:167-224).

    outs: (tl_heats, br_heats, tl_tags, br_tags, tl_offs, br_offs) — per-
    stack sequences; heats are logits (N, H, W, C) NHWC; tags/offs already
    gathered at gt indices: tags (N, M), offs (N, M, 2).
    targets: (gt_tl_heat, gt_br_heat, gt_mask, gt_tl_off, gt_br_off).
    """
    tl_heats, br_heats, tl_tags, br_tags, tl_offs, br_offs = outs
    gt_tl_heat, gt_br_heat, gt_mask, gt_tl_off, gt_br_off = targets

    focal = focal_loss([_clamped_sigmoid(t) for t in tl_heats], gt_tl_heat)
    focal += focal_loss([_clamped_sigmoid(b) for b in br_heats], gt_br_heat)

    pull_total, push_total = 0.0, 0.0
    for tl_tag, br_tag in zip(tl_tags, br_tags):
        pull, push = ae_loss(tl_tag, br_tag, gt_mask)
        pull_total += pull
        push_total += push

    off_total = 0.0
    for tl_off, br_off in zip(tl_offs, br_offs):
        off_total += offset_loss(tl_off, gt_tl_off, gt_mask)
        off_total += offset_loss(br_off, gt_br_off, gt_mask)

    loss = (
        focal
        + pull_weight * pull_total
        + push_weight * push_total
        + off_weight * off_total
    ) / max(len(tl_heats), 1)
    return loss


def cornernet_saccade_loss(outs, targets, pull_weight=1e-1, push_weight=1e-1,
                           off_weight=1.0):
    """CornerNet-Saccade loss (losses.py:97-165): the CornerNet terms with
    the validity-masked focal variant plus a per-scale attention focal term.

    outs: (tl_heats, br_heats, tl_tags, br_tags, tl_offs, br_offs, atts) —
    atts is per-stack lists of per-scale attention logits (N, h, w, 1).
    targets: (gt_tl_heat, gt_br_heat, gt_mask, gt_tl_off, gt_br_off,
    gt_tl_valid, gt_br_valid, gt_atts) with gt_atts a per-scale list.
    """
    tl_heats, br_heats, tl_tags, br_tags, tl_offs, br_offs, atts = outs
    (gt_tl_heat, gt_br_heat, gt_mask, gt_tl_off, gt_br_off,
     gt_tl_valid, gt_br_valid, gt_atts) = targets

    focal = focal_loss_masked(
        [_clamped_sigmoid(t) for t in tl_heats], gt_tl_heat, gt_tl_valid
    )
    focal += focal_loss_masked(
        [_clamped_sigmoid(b) for b in br_heats], gt_br_heat, gt_br_valid
    )

    # attention focal per scale, averaged over stacks (losses.py:138-143)
    att_total = 0.0
    n_scales = len(gt_atts)
    for scale in range(n_scales):
        scale_preds = [_clamped_sigmoid(stack_atts[scale]) for stack_atts in atts]
        att_total += focal_loss(scale_preds, gt_atts[scale]) / max(len(scale_preds), 1)

    pull_total, push_total = 0.0, 0.0
    for tl_tag, br_tag in zip(tl_tags, br_tags):
        pull, push = ae_loss(tl_tag, br_tag, gt_mask)
        pull_total += pull
        push_total += push

    off_total = 0.0
    for tl_off, br_off in zip(tl_offs, br_offs):
        off_total += offset_loss(tl_off, gt_tl_off, gt_mask)
        off_total += offset_loss(br_off, gt_br_off, gt_mask)

    loss = (
        focal + att_total + pull_weight * pull_total + push_weight * push_total
        + off_weight * off_total
    ) / max(len(tl_heats), 1)
    return loss
