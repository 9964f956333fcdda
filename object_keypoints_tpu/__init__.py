"""object_keypoints_tpu — a TPU-native (JAX/XLA/Pallas) semantic-keypoint perception framework.

A ground-up rebuild of the capabilities of ethz-asl/object_keypoints
(reference: /root/reference) designed TPU-first:

- pure-functional geometry core (SE3, fisheye/radtan cameras, stereo
  triangulation) that runs inside ``jax.jit`` with fixed iteration counts
  instead of OpenCV host calls,
- a CornerNet-Squeeze-style hourglass keypoint network in Flax (NHWC,
  bfloat16-friendly, SyncBN via mesh collectives),
- device-side heatmap decoding / association / unprojection with static
  capacities + masks instead of ragged Python loops,
- ``pjit``-sharded training over a ``jax.sharding.Mesh``.

Subpackages
-----------
geometry   SE3 + camera models + stereo rig (reference: perception/utils/*)
models     hourglass backbone, KeypointNet, CornerNet family (reference:
           perception/models.py + vendored corner_net_lite)
ops        device decode, corner pooling, NMS, Pallas kernels
pipeline   inference pipeline components (reference: perception/pipeline.py)
data       dataset encode/stream/targets/augment (reference: perception/datasets)
training   losses, train step, checkpointing (reference: perception/loss.py,
           scripts/train.py)
parallel   mesh construction + sharding rules
serving    model export: AOT-compiled stereo inference artifact
utils      timers, config, ROS conversions
"""

__version__ = "0.1.0"

# Honor an explicit platform override BEFORE any jax backend initializes.
# Rationale: out-of-process TPU plugins (like the axon tunnel here) can
# ignore JAX_PLATFORMS/JAX_PLATFORM_NAME and block in backend discovery
# even when the caller asked for CPU; jax.config.update("jax_platforms")
# is the only switch that reliably prevents that. Setting OKT_PLATFORM=cpu
# (or the standard JAX_PLATFORM_NAME) makes every CLI/script in this
# package runnable on hosts where the accelerator is absent or unreachable.
import os as _os

_platform = _os.environ.get("OKT_PLATFORM") or _os.environ.get("JAX_PLATFORM_NAME")
if _platform:
    import jax as _jax

    _jax.config.update("jax_platforms", _platform)
    del _jax
del _os, _platform
