"""Multi-chip serving: the inference contract sharded over a device mesh.

The reference serves a single-GPU TorchScript trace (pipeline.py:13-28);
scaling it means processes-per-GPU. TPU-native serving is SPMD: one jitted
program with the batch sharded over the mesh's ``data`` axis (and wide conv
kernels optionally over ``model``), XLA inserting the collectives over ICI.
This module wraps serving.export's inference contract with those shardings
so a stereo-frame batch fans out across every chip of a slice.

Works on any mesh — including the virtual CPU mesh used in CI
(tests/test_serving_sharded.py runs it 8-way).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from object_keypoints_tpu.models.keypoint_net import nhwc_outputs_to_reference
from object_keypoints_tpu.parallel import batch_sharding, create_mesh, shard_params
from object_keypoints_tpu.serving.export import load_model, load_quant_scales


def make_sharded_inference_fn(model, variables, mesh: Optional[Mesh] = None,
                              dtype=jnp.float32, quant_scales: dict = None):
    """Jitted reference-contract inference (NCHW in, NCHW-style out) with
    the batch sharded over ``mesh``'s data axis.

    The batch size must divide the data-axis size. Params are placed with
    the same wide-kernel ``model``-axis rule as training (parallel.mesh).
    """
    if mesh is None:
        mesh = create_mesh(model_parallel=1)
    params = shard_params(variables["params"], mesh)
    batch_stats = jax.device_put(
        variables.get("batch_stats", {}), NamedSharding(mesh, P())
    )
    in_sharding = batch_sharding(mesh, 4)
    out_sharding = NamedSharding(mesh, P("data"))

    def apply_model(x):
        v = {"params": params, "batch_stats": batch_stats}
        if quant_scales:
            from object_keypoints_tpu.serving.quantize import quantized_apply

            return quantized_apply(model, v, quant_scales, x, train=False)
        return model.apply(v, x, train=False)

    @jax.jit
    def infer(frames):
        x = jnp.transpose(jnp.asarray(frames, dtype), (0, 2, 3, 1))
        x = jax.lax.with_sharding_constraint(x, in_sharding)
        outs = apply_model(x)
        heat, depth, centers = nhwc_outputs_to_reference(outs, stack=-1)
        return (
            jax.lax.with_sharding_constraint(heat.astype(jnp.float32), out_sharding),
            jax.lax.with_sharding_constraint(depth.astype(jnp.float32), out_sharding),
            jax.lax.with_sharding_constraint(centers.astype(jnp.float32), out_sharding),
        )

    return infer


def load_sharded_inference_fn(path: str, mesh: Optional[Mesh] = None,
                              dtype=jnp.float32, quantize: str = "auto"):
    """Artifact directory -> sharded inference fn (load_inference_fn's
    multi-chip twin; same quantize modes)."""
    model, variables, _ = load_model(path, dtype=dtype)
    scales = None if quantize == "never" else load_quant_scales(path)
    if quantize == "require" and not scales:
        raise FileNotFoundError(f"no quant scales in artifact {path}")
    return make_sharded_inference_fn(
        model, variables, mesh=mesh, dtype=dtype, quant_scales=scales
    )
