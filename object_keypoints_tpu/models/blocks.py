"""Building blocks: conv-bn-relu, residual, fire module.

Flax/NHWC rebuilds of the vendored CornerNet-Lite blocks
(core/models/py_utils/utils.py:143-185 `convolution`/`residual`,
core/models/CornerNet_Squeeze.py:10-30 `fire_module`). Everything takes and
returns NHWC tensors (TPU-native layout; the reference is NCHW torch).

Conventions:
- explicit symmetric padding reproduces torch's Conv2d arithmetic exactly
  (511 -> 256 -> 128 -> 64 through the stride-2 stem);
- ``dtype`` is the compute dtype (bfloat16 on TPU), params stay float32;
- BatchNorm uses flax's running statistics; under pjit the batch axis is
  global, so multi-chip data parallelism gets SyncBN semantics (the
  reference needs apex SyncBN conversion for this, py_factory.py:44-49)
  without extra code. ``bn_cross_replica_axis`` exists for shard_map/pmap
  callers.
- kernel init matches torch Conv2d's kaiming_uniform(a=sqrt(5)) default so
  from-scratch training starts from the same distribution (SURVEY.md §7
  "init-distribution parity"; no pretrained .pkl exists in the reference
  repo either, models.py:74-77).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
from flax import linen as nn

# torch Conv2d default: kaiming_uniform(a=sqrt(5)) == U(+-sqrt(1/fan_in)),
# i.e. variance-scaling with scale 1/3, fan_in, uniform.
torch_conv_kernel_init = nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def _norm(train: bool, dtype, axis_name: Optional[str], name: str = None):
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        axis_name=axis_name,
        name=name,
    )


class ConvBlock(nn.Module):
    """conv(k) [+ BN] + ReLU — the vendored `convolution`
    (core/models/py_utils/utils.py:143-156)."""

    features: int
    kernel: int = 3
    stride: int = 1
    with_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=not self.with_bn,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
        )(x)
        if self.with_bn:
            x = _norm(train, self.dtype, self.bn_cross_replica_axis)(x)
        return nn.relu(x)


class Residual(nn.Module):
    """conv-bn-relu + conv-bn with projection skip — the vendored `residual`
    (core/models/py_utils/utils.py:158-185)."""

    features: int
    kernel: int = 3
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = (self.kernel - 1) // 2
        inp_dim = x.shape[-1]
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            strides=(self.stride, self.stride),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
        )(x)
        y = _norm(train, self.dtype, self.bn_cross_replica_axis)(y)
        y = nn.relu(y)
        y = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=[(pad, pad), (pad, pad)],
            use_bias=False,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
        )(y)
        y = _norm(train, self.dtype, self.bn_cross_replica_axis)(y)

        if self.stride != 1 or inp_dim != self.features:
            skip = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                dtype=self.dtype,
                kernel_init=torch_conv_kernel_init,
            )(x)
            skip = _norm(train, self.dtype, self.bn_cross_replica_axis)(skip)
        else:
            skip = x
        return nn.relu(y + skip)


class FireModule(nn.Module):
    """SqueezeNet-style fire module with a depthwise 3x3 expand branch —
    CornerNet-Squeeze's workhorse (core/models/CornerNet_Squeeze.py:10-30).

    squeeze 1x1 (out/sr) + BN, then concat[1x1 -> out/2, depthwise 3x3 ->
    out/2] + BN, identity skip when shape-preserving, ReLU.
    """

    features: int
    sr: int = 2
    stride: int = 1
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp_dim = x.shape[-1]
        squeezed = self.features // self.sr
        y = nn.Conv(
            squeezed, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
        )(x)
        y = _norm(train, self.dtype, self.bn_cross_replica_axis)(y)
        b1 = nn.Conv(
            self.features // 2,
            (1, 1),
            strides=(self.stride, self.stride),
            use_bias=False,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
        )(y)
        b2 = nn.Conv(
            self.features // 2,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=[(1, 1), (1, 1)],
            feature_group_count=squeezed,
            use_bias=False,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
        )(y)
        y = jnp.concatenate([b1, b2], axis=-1)
        y = _norm(train, self.dtype, self.bn_cross_replica_axis)(y)
        if self.stride == 1 and inp_dim == self.features:
            return nn.relu(y + x)
        return nn.relu(y)


class MergeBN(nn.Module):
    """1x1 conv (no bias) + BN — the inter-stack merge module
    (core/models/CornerNet_Squeeze.py:62-66)."""

    features: int
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
        )(x)
        return _norm(train, self.dtype, self.bn_cross_replica_axis)(x)
