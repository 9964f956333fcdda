"""Device mesh + sharding rules.

Replaces the reference's NCCL/apex distributed plumbing
(corner_net_lite/train.py:37-44,193-247 and py_factory.py:44-49) with the
JAX mesh recipe: pick a mesh, annotate shardings, let XLA insert
collectives over ICI/DCN.

Axes:
- ``data``  — batch sharding (pure DP, the reference's only strategy);
- ``model`` — channel sharding of wide conv kernels (tensor parallelism the
  reference lacks; useful at large batch/feature scale and exercised by the
  multi-chip dry run).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed():
    """Multi-host init (jax.distributed) — the TPU-native replacement for
    torch.distributed.init_process_group(backend='nccl') + mp.spawn rank
    orchestration (corner_net_lite/train.py:37-44,193-247). No-op when
    COORDINATOR_ADDRESS is unset (single host).

    On managed TPU slices jax.distributed.initialize() auto-detects the
    cluster; for manual launches (incl. the 2-process CPU smoke test,
    tests/test_multihost.py) set COORDINATOR_ADDRESS=host:port,
    NUM_PROCESSES and PROCESS_ID — the reference's --dist-url /
    --world-size / --rank flags."""
    import os

    addr = os.environ.get("COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {"coordinator_address": addr}
    if os.environ.get("NUM_PROCESSES"):
        if "PROCESS_ID" not in os.environ:
            raise ValueError(
                "NUM_PROCESSES is set but PROCESS_ID is not; a manual "
                "multi-process launch needs COORDINATOR_ADDRESS, "
                "NUM_PROCESSES and PROCESS_ID (one unique id per process)"
            )
        kwargs["num_processes"] = int(os.environ["NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["PROCESS_ID"])
    jax.distributed.initialize(**kwargs)


def create_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    axis_names=("data", "model"),
) -> Mesh:
    """Build a (data, model) mesh over all devices.

    model_parallel must divide the device count; the remainder becomes the
    data axis. With the default model_parallel=1 this is pure DP, matching
    the reference's strategy inventory (SURVEY.md §2.5).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, axis_names)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) axis over ``data``; replicate the rest.

    Uniform per-device batch — the reference's uneven chunk_sizes hack
    (configs/CornerNet_Squeeze.json) exists only because its GPU 0 also
    stores optimizer state; unnecessary under SPMD.
    """
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _param_spec(path: str, value, model_axis_size: int) -> P:
    """Sharding rule for one parameter.

    Conv kernels (H, W, Cin, Cout) with wide, divisible Cout are sharded
    over ``model``; everything else (biases, BN scales, small kernels) is
    replicated. This keeps the all-gather volume negligible while proving
    real tensor-parallel lowering in the dry run.
    """
    if model_axis_size <= 1:
        return P()
    shape = value.shape
    if len(shape) == 4 and shape[-1] >= 256 and shape[-1] % model_axis_size == 0:
        return P(None, None, None, "model")
    return P()


def shard_params(params, mesh: Mesh):
    """Apply :func:`_param_spec` across a parameter pytree and device_put."""
    model_axis = mesh.shape["model"]

    def place(path, value):
        spec = _param_spec(jax.tree_util.keystr(path), value, model_axis)
        return jax.device_put(value, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def param_specs(params, mesh: Mesh):
    """The PartitionSpec tree :func:`shard_params` would place (works on
    ShapeDtypeStruct trees too — used for AOT compilation and audits)."""
    model_axis = mesh.shape["model"]
    return jax.tree_util.tree_map_with_path(
        lambda path, v: _param_spec(jax.tree_util.keystr(path), v, model_axis),
        params,
    )


def model_sharded_paths(params, mesh: Mesh):
    """Keystr paths of every parameter the wide-kernel rule shards over
    ``model`` — the audit surface for the full-geometry mesh proof
    (tests/test_mesh_full_geometry.py, __graft_entry__.dryrun_multichip)."""
    model_axis = mesh.shape["model"]
    out = []

    def visit(path, value):
        key = jax.tree_util.keystr(path)
        if _param_spec(key, value, model_axis) != P():
            out.append(key)
        return value

    jax.tree_util.tree_map_with_path(visit, params)
    return sorted(out)
