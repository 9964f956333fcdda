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
