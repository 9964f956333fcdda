"""KeypointNet: hourglass backbone + heatmap / depth / center-offset heads.

Rebuild of perception/models.py:13-85. Heads are 3-conv prediction modules
(1x1 conv-bn-relu 256->features, 1x1 conv-bn-relu features->32, 1x1 conv
with bias, models.py:13-18), one independent pair per hourglass stack (deep
supervision, models.py:20-53). Dropout is applied to both stack features
before every head (models.py:80-85).

Quirk preserved deliberately: the reference initializes the heatmap head's
final bias to 0.01/0.99 ≈ 0.0101 (models.py:25-26) — the *odds*, not
log-odds; sigmoid(0.0101) ≈ 0.503. Kept bit-for-bit for init parity.

Layouts: NHWC in/out. Center head emits (N, H, W, T, 2) where T =
heatmaps_out - 1 (the reference reshapes NCHW to (N, T, 2, H, W),
models.py:49-53).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from object_keypoints_tpu.models.blocks import ConvBlock, torch_conv_kernel_init
from object_keypoints_tpu.models.hourglass import HourglassStack


class PredictionModule(nn.Module):
    """3-conv head (perception/models.py:13-18)."""

    features: int
    out: int
    bias_init_value: float = 0.0
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kw = dict(dtype=self.dtype, bn_cross_replica_axis=self.bn_cross_replica_axis)
        x = ConvBlock(self.features, kernel=1, name="conv0", **kw)(x, train)
        x = ConvBlock(32, kernel=1, name="conv1", **kw)(x, train)
        return nn.Conv(
            self.out,
            (1, 1),
            use_bias=True,
            dtype=self.dtype,
            kernel_init=torch_conv_kernel_init,
            bias_init=nn.initializers.constant(self.bias_init_value),
            name="conv_out",
        )(x)


class KeypointNetOutputs(NamedTuple):
    """Per-stack head outputs (tuples ordered stack0, stack1, ...)."""

    heatmaps: Tuple[jax.Array, ...]  # each (N, H, W, K) logits
    depth: Tuple[jax.Array, ...]  # each (N, H, W, K)
    centers: Tuple[jax.Array, ...]  # each (N, H, W, K-1, 2)


class KeypointNet(nn.Module):
    """Hourglass + 3 heads (perception/models.py:60-85).

    ``output_size`` in the reference ctor is accepted-and-ignored
    (models.py:61-67); mirrored here by simply not having it.
    """

    heatmaps_out: int = 2
    features: int = 128
    dropout: float = 0.1
    stacks: int = 2
    levels: int = 4
    dims: Tuple[int, ...] = (256, 256, 384, 384, 512)
    mods: Tuple[int, ...] = (2, 2, 2, 2, 4)
    stem_features: Tuple[int, int] = (128, 256)
    cnv_dim: int = 256
    dtype: jnp.dtype = jnp.float32
    bn_cross_replica_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False) -> KeypointNetOutputs:
        kw = dict(dtype=self.dtype, bn_cross_replica_axis=self.bn_cross_replica_axis)
        feats = HourglassStack(
            stacks=self.stacks,
            levels=self.levels,
            dims=self.dims,
            mods=self.mods,
            stem_features=self.stem_features,
            cnv_dim=self.cnv_dim,
            name="backbone",
            **kw,
        )(x, train)
        feats = [
            nn.Dropout(self.dropout, deterministic=not train)(f) for f in feats
        ]

        heat, depth, centers = [], [], []
        T = self.heatmaps_out - 1
        for s, f in enumerate(feats):
            heat.append(
                PredictionModule(
                    self.features, self.heatmaps_out,
                    bias_init_value=0.01 / 0.99,  # models.py:25-26 quirk
                    name=f"heatmap_head_{s}", **kw,
                )(f, train)
            )
            depth.append(
                PredictionModule(
                    self.features, self.heatmaps_out, name=f"depth_head_{s}", **kw
                )(f, train)
            )
            c = PredictionModule(
                self.features, T * 2, name=f"center_head_{s}", **kw
            )(f, train)
            n, h, w, _ = c.shape
            centers.append(c.reshape(n, h, w, T, 2))
        return KeypointNetOutputs(tuple(heat), tuple(depth), tuple(centers))


def init_keypoint_net(
    rng: jax.Array,
    heatmaps_out: int,
    features: int = 128,
    dropout: float = 0.1,
    input_size: Sequence[int] = (511, 511),
    dtype=jnp.float32,
):
    """Initialize a KeypointNet; returns (model, variables)."""
    model = KeypointNet(
        heatmaps_out=heatmaps_out, features=features, dropout=dropout, dtype=dtype
    )
    dummy = jnp.zeros((1, input_size[0], input_size[1], 3), dtype)
    variables = model.init({"params": rng}, dummy, train=False)
    return model, variables


def nhwc_outputs_to_reference(outputs: KeypointNetOutputs, stack: int = -1):
    """Convert one stack's NHWC outputs to the reference serving layout
    (scripts/package_model.py:26-28): sigmoid heatmaps (N, K, H, W), depth
    (N, K, H, W), centers (N, T, 2, H, W)."""
    heat = jax.nn.sigmoid(outputs.heatmaps[stack]).transpose(0, 3, 1, 2)
    depth = outputs.depth[stack].transpose(0, 3, 1, 2)
    centers = outputs.centers[stack].transpose(0, 3, 4, 1, 2)
    return heat, depth, centers
