"""CornerNet-Squeeze hourglass backbone in Flax (NHWC).

Rebuild of the vendored recursive hourglass
(core/models/py_utils/modules.py:25-93) with CornerNet-Squeeze's makers
(core/models/CornerNet_Squeeze.py:32-89): fire-module up/low layers,
stride-2 fire downsampling (no pooling layer), ConvTranspose(4, s2) unpool,
additive merge; stem = conv7/s2 + residual/s2 + residual/s2 (511 -> 64);
two stacks with 1x1+BN inter-stack fusion.

Default geometry (CornerNet_Squeeze.py:73-83): 4 recursion levels,
dims [256, 256, 384, 384, 512], modules [2, 2, 2, 2, 4].
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from object_keypoints_tpu.models.blocks import (
    ConvBlock,
    FireModule,
    MergeBN,
    Residual,
    torch_conv_kernel_init,
)


class FireHourglass(nn.Module):
    """One recursive hourglass level (modules.py:25-66 with fire makers)."""

    n: int
    dims: Tuple[int, ...]
    mods: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        curr_dim, next_dim = self.dims[0], self.dims[1]
        curr_mod, next_mod = self.mods[0], self.mods[1]
        kw = dict(dtype=self.dtype, bn_cross_replica_axis=self.bn_cross_replica_axis)

        # up path: fire(curr -> curr) x curr_mod (make_layer)
        up1 = x
        for i in range(curr_mod):
            up1 = FireModule(curr_dim, name=f"up1_{i}", **kw)(up1, train)

        # down path: stride-2 fire then fire x (curr_mod - 1) (make_hg_layer)
        low1 = FireModule(next_dim, stride=2, name="low1_0", **kw)(x, train)
        for i in range(1, curr_mod):
            low1 = FireModule(next_dim, name=f"low1_{i}", **kw)(low1, train)

        if self.n > 1:
            low2 = FireHourglass(
                self.n - 1, self.dims[1:], self.mods[1:], name="low2", **kw
            )(low1, train)
        else:
            low2 = low1
            for i in range(next_mod):
                low2 = FireModule(next_dim, name=f"low2_{i}", **kw)(low2, train)

        # reverse path: fire(next -> next) x (curr_mod - 1) then next -> curr
        low3 = low2
        for i in range(curr_mod - 1):
            low3 = FireModule(next_dim, name=f"low3_{i}", **kw)(low3, train)
        low3 = FireModule(curr_dim, name=f"low3_{curr_mod - 1}", **kw)(low3, train)

        # unpool: ConvTranspose(4, s2, p1) (CornerNet_Squeeze.py:35-36)
        up2 = nn.ConvTranspose(
            curr_dim,
            (4, 4),
            strides=(2, 2),
            padding="SAME",
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            name="up2",
        )(low3)
        return up1 + up2


class ResidualHourglass(nn.Module):
    """Residual-block hourglass level for the CornerNet / CornerNet-Saccade
    variants (modules.py:25-66 with CornerNet.py:13-16 makers: stride-2
    residual downsampling, nearest-neighbor x2 unpool).

    With ``collect_ups=True`` it also returns the per-level merge outputs
    (deepest-first), which the saccade attention heads consume
    (modules.py:151-196).
    """

    n: int
    dims: Tuple[int, ...]
    mods: Tuple[int, ...]
    collect_ups: bool = False
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        curr_dim, next_dim = self.dims[0], self.dims[1]
        curr_mod, next_mod = self.mods[0], self.mods[1]
        kw = dict(dtype=self.dtype, bn_cross_replica_axis=self.bn_cross_replica_axis)

        up1 = x
        for i in range(curr_mod):
            up1 = Residual(curr_dim, name=f"up1_{i}", **kw)(up1, train)

        low1 = Residual(next_dim, stride=2, name="low1_0", **kw)(x, train)
        for i in range(1, curr_mod):
            low1 = Residual(next_dim, name=f"low1_{i}", **kw)(low1, train)

        ups = []
        if self.n > 1:
            inner = ResidualHourglass(
                self.n - 1, self.dims[1:], self.mods[1:],
                collect_ups=self.collect_ups, name="low2", **kw,
            )(low1, train)
            low2, ups = inner if self.collect_ups else (inner, [])
        else:
            low2 = low1
            for i in range(next_mod):
                low2 = Residual(next_dim, name=f"low2_{i}", **kw)(low2, train)

        low3 = low2
        for i in range(curr_mod - 1):
            low3 = Residual(next_dim, name=f"low3_{i}", **kw)(low3, train)
        low3 = Residual(curr_dim, name=f"low3_{curr_mod - 1}", **kw)(low3, train)

        # nearest-neighbor x2 unpool (modules.py:19-20 default maker)
        n_, h, w, c = low3.shape
        up2 = jax.image.resize(low3, (n_, h * 2, w * 2, c), method="nearest")
        merged = up1 + up2
        if self.collect_ups:
            return merged, ups + [merged]
        return merged


class HourglassStack(nn.Module):
    """Stem + N hourglass stacks with inter-stack fusion (modules.py:68-93).

    Returns the list of per-stack 256-channel feature maps ("cnvs") that the
    KeypointNet heads consume (deep supervision across stacks).
    """

    stacks: int = 2
    levels: int = 4
    dims: Sequence[int] = (256, 256, 384, 384, 512)
    mods: Sequence[int] = (2, 2, 2, 2, 4)
    stem_features: Tuple[int, int] = (128, 256)
    cnv_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_cross_replica_axis=self.bn_cross_replica_axis)

        # stem: 511 -> 256 -> 128 -> 64 (CornerNet_Squeeze.py:66-72)
        inter = ConvBlock(self.stem_features[0], kernel=7, stride=2, name="pre_conv", **kw)(x, train)
        inter = Residual(self.stem_features[1], stride=2, name="pre_res1", **kw)(inter, train)
        inter = Residual(self.stem_features[1], stride=2, name="pre_res2", **kw)(inter, train)

        outs = []
        for s in range(self.stacks):
            hg = FireHourglass(
                self.levels, tuple(self.dims), tuple(self.mods), name=f"hg_{s}", **kw
            )(inter, train)
            cnv = ConvBlock(self.cnv_dim, kernel=3, name=f"cnv_{s}", **kw)(hg, train)
            outs.append(cnv)
            if s < self.stacks - 1:
                fused = MergeBN(self.cnv_dim, name=f"inter_merge_{s}", **kw)(inter, train)
                fused = fused + MergeBN(self.cnv_dim, name=f"cnv_merge_{s}", **kw)(cnv, train)
                fused = nn.relu(fused)
                inter = Residual(self.cnv_dim, name=f"inter_res_{s}", **kw)(fused, train)
        return outs
