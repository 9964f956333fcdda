"""The CornerNet detector family: CornerNet, CornerNet-Squeeze,
CornerNet-Saccade — full vendored-surface parity
(corner_net_lite/core/models/*).

Architecture notes (cited to the reference):
- corner-pool block: two directional pool branches + 3x3 merge with a 1x1
  skip (py_utils/utils.py:187-226); pooling itself is a directional cummax
  (ops/corner_pool.py) instead of the reference's C++ extensions;
- heads: convK(with_bn=False) + 1x1, heat bias -2.19; K=3 for CornerNet /
  Saccade (CornerNet.py:20-24), K=1 for Squeeze (CornerNet_Squeeze.py:54-58);
- CornerNet: 2 stacks x 5-level residual hourglass, dims
  [256,256,384,384,384,512] mods [2,2,2,2,2,4], 2-stage stem
  (CornerNet.py:31-49);
- CornerNet-Squeeze: 2 stacks x 4-level fire hourglass, 3-stage stem
  (CornerNet_Squeeze.py:66-89);
- CornerNet-Saccade: 3 stacks x 3-level residual hourglass, dims
  [256,384,384,512] mods [1,1,1,1], per-level attention heads on the
  upsampled merge features, att bias -2.19 (CornerNet_Saccade.py:31-91,
  modules.py:151-293).

Call convention: ``model.apply(vars, x, train=True)`` returns the per-stack
training outputs [tl_heats, br_heats, tl_tags, br_tags, tl_offs, br_offs
(, atts)]; ``train=False, test=True`` returns decoded detections + the last
stack's raw heads (hg_net._test, modules.py:137-149).
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from object_keypoints_tpu.models.blocks import (
    ConvBlock,
    MergeBN,
    Residual,
    torch_conv_kernel_init,
)
from object_keypoints_tpu.models.hourglass import FireHourglass, ResidualHourglass
from object_keypoints_tpu.ops import corner_pool as pools
from object_keypoints_tpu.ops.detection_decode import decode_detections


class PredModule(nn.Module):
    """conv3 (no BN) + 1x1 head (CornerNet.py:20-24)."""

    out: int
    hidden: int = 256
    kernel: int = 3
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = ConvBlock(
            self.hidden, kernel=self.kernel, with_bn=False, dtype=self.dtype,
            name="conv0",
        )(x, train)
        return nn.Conv(
            self.out, (1, 1), use_bias=True, dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.constant(self.bias_init_value),
            name="conv_out",
        )(x)


class CornerPoolBlock(nn.Module):
    """Two pooled branches + merge + skip (py_utils/utils.py:187-226)."""

    features: int
    pool1: Callable = pools.top_pool
    pool2: Callable = pools.left_pool
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_cross_replica_axis=self.bn_cross_replica_axis)
        p1 = self.pool1(ConvBlock(128, kernel=3, name="p1_conv1", **kw)(x, train))
        p2 = self.pool2(ConvBlock(128, kernel=3, name="p2_conv1", **kw)(x, train))

        p = nn.Conv(
            self.features, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False,
            dtype=self.dtype, kernel_init=torch_conv_kernel_init, name="p_conv1",
        )(p1 + p2)
        p = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_cross_replica_axis, name="p_bn1",
        )(p)

        skip = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=torch_conv_kernel_init, name="conv1",
        )(x)
        skip = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype, axis_name=self.bn_cross_replica_axis, name="bn1",
        )(skip)
        y = nn.relu(p + skip)
        return ConvBlock(self.features, kernel=3, name="conv2", **kw)(y, train)


class CornerNetModel(nn.Module):
    """Generic hg_net (modules.py:95-149) parameterized over the hourglass
    flavor; instantiate via the cornernet()/cornernet_squeeze()/
    cornernet_saccade() factories."""

    categories: int = 80
    stacks: int = 2
    levels: int = 4
    dims: Tuple[int, ...] = (256, 256, 384, 384, 512)
    mods: Tuple[int, ...] = (2, 2, 2, 2, 4)
    hourglass: str = "fire"  # 'fire' | 'residual'
    stem_residuals: int = 2  # squeeze has 3, others 2
    cnv_dim: int = 256
    head_kernel: int = 3  # squeeze's _pred_mod uses 1x1 (CornerNet_Squeeze.py:54-58)
    with_attention: bool = False  # saccade
    att_dims: Tuple[int, ...] = ()
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False, test: bool = False, **decode_kwargs):
        kw = dict(dtype=self.dtype, bn_cross_replica_axis=self.bn_cross_replica_axis)

        inter = ConvBlock(128, kernel=7, stride=2, name="pre_conv", **kw)(x, train)
        for i in range(self.stem_residuals):
            inter = Residual(256, stride=2, name=f"pre_res{i + 1}", **kw)(inter, train)

        cnvs = []
        atts_per_stack = []
        for s in range(self.stacks):
            if self.hourglass == "fire":
                hg = FireHourglass(
                    self.levels, self.dims, self.mods, name=f"hg_{s}", **kw
                )(inter, train)
                ups = []
            else:
                out = ResidualHourglass(
                    self.levels, self.dims, self.mods,
                    collect_ups=self.with_attention, name=f"hg_{s}", **kw,
                )(inter, train)
                hg, ups = out if self.with_attention else (out, [])
            cnv = ConvBlock(self.cnv_dim, kernel=3, name=f"cnv_{s}", **kw)(hg, train)
            cnvs.append(cnv)
            if self.with_attention:
                atts_per_stack.append(
                    [
                        PredModule(1, bias_init_value=-2.19, name=f"att_{s}_{i}",
                                   dtype=self.dtype)(u, train)
                        for i, u in enumerate(ups)
                    ]
                )
            if s < self.stacks - 1:
                fused = MergeBN(self.cnv_dim, name=f"inter_merge_{s}", **kw)(inter, train)
                fused = fused + MergeBN(self.cnv_dim, name=f"cnv_merge_{s}", **kw)(cnv, train)
                inter = Residual(self.cnv_dim, name=f"inter_res_{s}", **kw)(
                    nn.relu(fused), train
                )

        def heads(cnv, s):
            tl_mod = CornerPoolBlock(
                self.cnv_dim, pools.top_pool, pools.left_pool, name=f"tl_mod_{s}", **kw
            )(cnv, train)
            br_mod = CornerPoolBlock(
                self.cnv_dim, pools.bottom_pool, pools.right_pool, name=f"br_mod_{s}", **kw
            )(cnv, train)
            tl_heat = PredModule(self.categories, kernel=self.head_kernel, bias_init_value=-2.19,
                                 name=f"tl_heat_{s}", dtype=self.dtype)(tl_mod, train)
            br_heat = PredModule(self.categories, kernel=self.head_kernel, bias_init_value=-2.19,
                                 name=f"br_heat_{s}", dtype=self.dtype)(br_mod, train)
            tl_tag = PredModule(1, kernel=self.head_kernel, name=f"tl_tag_{s}", dtype=self.dtype)(tl_mod, train)
            br_tag = PredModule(1, kernel=self.head_kernel, name=f"br_tag_{s}", dtype=self.dtype)(br_mod, train)
            tl_off = PredModule(2, kernel=self.head_kernel, name=f"tl_off_{s}", dtype=self.dtype)(tl_mod, train)
            br_off = PredModule(2, kernel=self.head_kernel, name=f"br_off_{s}", dtype=self.dtype)(br_mod, train)
            return tl_heat, br_heat, tl_tag, br_tag, tl_off, br_off

        if not test:
            per_stack = [heads(cnv, s) for s, cnv in enumerate(cnvs)]
            outs = [list(t) for t in zip(*per_stack)]
            if self.with_attention:
                outs.append(atts_per_stack)
            return outs

        # test path: decode the last stack only (modules.py:137-149)
        tl_heat, br_heat, tl_tag, br_tag, tl_off, br_off = heads(cnvs[-1], self.stacks - 1)
        detections = decode_detections(
            tl_heat, br_heat, tl_tag, br_tag, tl_off, br_off, **decode_kwargs
        )
        if self.with_attention:
            atts = [jnp.clip(nn.sigmoid(a), 1e-4, 1 - 1e-4) for a in atts_per_stack[-1]]
            return (detections, tl_heat, br_heat, tl_tag, br_tag), atts
        return detections, tl_heat, br_heat, tl_tag, br_tag


def cornernet(categories: int = 80, dtype=jnp.float32) -> CornerNetModel:
    """CornerNet (CornerNet.py:31-71)."""
    return CornerNetModel(
        categories=categories, stacks=2, levels=5,
        dims=(256, 256, 384, 384, 384, 512), mods=(2, 2, 2, 2, 2, 4),
        hourglass="residual", stem_residuals=1, dtype=dtype,
    )


def cornernet_squeeze(categories: int = 80, dtype=jnp.float32) -> CornerNetModel:
    """CornerNet-Squeeze (CornerNet_Squeeze.py:53-111)."""
    return CornerNetModel(
        categories=categories, stacks=2, levels=4,
        dims=(256, 256, 384, 384, 512), mods=(2, 2, 2, 2, 4),
        hourglass="fire", stem_residuals=2, head_kernel=1, dtype=dtype,
    )


def cornernet_saccade(categories: int = 80, dtype=jnp.float32) -> CornerNetModel:
    """CornerNet-Saccade (CornerNet_Saccade.py:31-91)."""
    return CornerNetModel(
        categories=categories, stacks=3, levels=3,
        dims=(256, 384, 384, 512), mods=(1, 1, 1, 1),
        hourglass="residual", stem_residuals=1,
        with_attention=True, att_dims=(384, 384, 256), dtype=dtype,
    )


def tiny_cornernet(arch: str, categories: int = 80,
                   dtype=jnp.float32) -> CornerNetModel:
    """The shared --tiny model for train_detector.py / evaluate_detector.py
    / benchmarks (pairs with utils.config.tiny_db_overrides): one stack,
    two hourglass levels, /4 stem — the 64->16 contract the accuracy gates
    train in minutes on this 1-core host.

    CornerNet_Saccade needs the RESIDUAL hourglass (the fire variant has no
    per-level merge outputs to hang attention heads on — models/
    CornerNet_Saccade.py's att modules consume them) and its two levels
    yield two attention maps, at /8 and /4 of the input (8x8 and 16x16
    here), matching tiny_db_overrides' att_sizes."""
    saccade = arch.split("-")[0] == "CornerNet_Saccade"
    return CornerNetModel(
        categories=categories, stacks=1, levels=2, dims=(8, 8, 16),
        mods=(1, 1, 1), hourglass="residual" if saccade else "fire",
        stem_residuals=1, cnv_dim=8, with_attention=saccade, dtype=dtype,
    )
