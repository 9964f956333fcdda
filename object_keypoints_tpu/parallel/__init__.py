"""Parallelism: device mesh construction + sharding rules.

The reference scales with custom torch DataParallel (uneven chunk_sizes,
data_parallel.py:43-83) and apex DDP + SyncBN over NCCL
(py_factory.py:44-49, corner_net_lite/train.py:193-247). TPU-native
equivalent: one global ``jax.sharding.Mesh``; batch sharded over the
``data`` axis, wide conv channels optionally sharded over ``model``; XLA
GSPMD inserts all collectives (gradient psum over ICI, global batch-norm
statistics = SyncBN) — no hand-written communication.
"""

from object_keypoints_tpu.parallel.mesh import (
    create_mesh,
    batch_sharding,
    replicated_sharding,
    shard_params,
    param_specs,
    model_sharded_paths,
    initialize_distributed,
)

__all__ = [
    "create_mesh",
    "batch_sharding",
    "replicated_sharding",
    "shard_params",
    "param_specs",
    "model_sharded_paths",
    "initialize_distributed",
]
