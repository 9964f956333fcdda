"""2-process jax.distributed smoke test: the multi-host DDP path executed,
not just hooked.

The reference's multi-node training is mp.spawn one-process-per-GPU +
torch.distributed NCCL (corner_net_lite/train.py:37-44,193-247). The
TPU-native equivalent is single-program multi-host JAX: every process calls
jax.distributed.initialize, builds the SAME global mesh over all processes'
devices, and jit inserts the collectives. This test launches two local
processes (coordinator on localhost), each contributing 2 virtual CPU
devices, and runs one REAL sharded KeypointNet train step over the global
4-device mesh.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

# two-subprocess jax.distributed runs pay full uncached compiles (minutes
# each); default runs include this — deselect with -m 'not slow'
pytestmark = pytest.mark.slow

REPO = str(pathlib.Path(__file__).resolve().parent.parent)

CHILD = r"""
import os
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

from object_keypoints_tpu.parallel import (
    batch_sharding, create_mesh, initialize_distributed,
)
from object_keypoints_tpu.training.trainer import (
    create_train_state, make_optimizer, train_step,
)
from object_keypoints_tpu.models import KeypointNet

initialize_distributed()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 4  # 2 local per process, 4 global

mesh = create_mesh(model_parallel=1)  # (4, 1) over ALL global devices
sharding = batch_sharding(mesh, 4)

model = KeypointNet(
    heatmaps_out=3, stacks=1, levels=2, dims=(8, 8, 16), mods=(1, 1, 1),
    stem_features=(4, 8), cnv_dim=8, features=4, dropout=0.0,
)

size, k, t = 32, 3, 2
h = w = size // 8
global_batch = 4
rng = np.random.default_rng(0)  # same data everywhere; each proc feeds its half
full = {
    "frame": rng.normal(size=(global_batch, size, size, 3)).astype(np.float32),
    "heatmaps": rng.uniform(size=(global_batch, h, w, k)).astype(np.float32),
    "depth": rng.uniform(size=(global_batch, h, w, k)).astype(np.float32),
    "centers": rng.normal(size=(global_batch, h, w, t, 2)).astype(np.float32),
}
pid = jax.process_index()
lo, hi = pid * 2, pid * 2 + 2


def to_global(x):
    from jax.sharding import NamedSharding, PartitionSpec as P

    s = NamedSharding(mesh, P("data", *([None] * (x.ndim - 1))))
    return jax.make_array_from_process_local_data(s, x[lo:hi], x.shape)


batch = {key: to_global(v) for key, v in full.items()}

# params must be identical global (replicated) arrays: compute them inside
# jit with a replicated out_sharding so every process agrees
from jax.sharding import NamedSharding, PartitionSpec as P

replicated = NamedSharding(mesh, P())
init_fn = jax.jit(
    lambda: model.init({"params": jax.random.key(0)},
                       jax.numpy.zeros((1, size, size, 3)), train=False),
    out_shardings=replicated,
)
variables = init_fn()
tx = make_optimizer(lr=1e-3)
state = create_train_state(model, variables, tx)

state, metrics = train_step(model, state, batch, jax.random.key(1))
loss = float(metrics["loss"])
assert np.isfinite(loss)
print(f"MULTIHOST_OK process={pid} loss={loss:.6f}", flush=True)
"""


TRAIN_CHILD = r"""
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

from object_keypoints_tpu.parallel import initialize_distributed

initialize_distributed()
assert jax.process_count() == 2

import numpy as np
from object_keypoints_tpu.training.loop import TrainConfig, train

data_root = sys.argv[1]
out_dir = sys.argv[2]
config = TrainConfig(
    train=os.path.join(data_root, "train"),
    val=os.path.join(data_root, "val"),
    keypoint_config=[1, 3],
    batch_size=2,  # per process; global 4 over the 4 global devices
    lr=1e-3,
    features=8,
    dropout=0.0,
    pool=4,
    epochs=1,
    out_dir=out_dir,
    model_overrides=dict(levels=2, dims=(8, 8, 16), mods=(1, 1, 1),
                         stem_features=(4, 8), cnv_dim=8),
    log_every=1,
)
result = train(config)
assert np.isfinite(result["best_val_loss"]) or jax.process_index() != 0
print(f"MULTIHOST_TRAIN_OK process={jax.process_index()} "
      f"steps={result['steps']}", flush=True)
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


class TestMultihost:
    def test_two_process_sharded_train_step(self, tmp_path):
        port = _free_port()
        script = tmp_path / "child.py"
        script.write_text(CHILD)
        procs = []
        for pid in range(2):
            env = {
                k: v
                for k, v in os.environ.items()
                # JAX_COMPILATION_CACHE_DIR must NOT reach the children:
                # reloading persisted XLA:CPU AOT executables in a
                # jax.distributed process trips a machine-feature mismatch
                # (cpu_aot_loader) that kills one child and times out the
                # other's gloo init — measured cold=pass(89s) / warm=fail.
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                             "JAX_COMPILATION_CACHE_DIR")
            }
            env.update(
                JAX_PLATFORMS="cpu",
                JAX_PLATFORM_NAME="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=2",
                COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                NUM_PROCESSES="2",
                PROCESS_ID=str(pid),
                PYTHONPATH=REPO,
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(script)],
                    env=env,
                    cwd=REPO,
                    stdout=subprocess.PIPE,
                    stderr=subprocess.PIPE,
                    text=True,
                )
            )
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=420)
            outs.append((p.returncode, out, err))
        for rc, out, err in outs:
            assert rc == 0, err[-3000:]
            assert "MULTIHOST_OK" in out
        # the globally-sharded loss must agree across processes
        losses = {o.split("loss=")[1].strip() for _, o, _ in outs}
        assert len(losses) == 1, losses

    def test_two_process_training_loop(self, tmp_path):
        """The FULL training loop (data -> sharded steps -> val ->
        checkpoints -> export) runs 2-process: per-process sampling feeds a
        global batch via make_array_from_process_local_data, state is
        replicated, rank 0 writes artifacts."""
        import pytest

        pytest.importorskip("cv2")
        from object_keypoints_tpu.data.synthetic import make_synthetic_dataset_tree

        data_root = tmp_path / "data"
        make_synthetic_dataset_tree(
            str(data_root), str(pathlib.Path(REPO) / "config" / "calibration.yaml"),
            [1, 3], n_train=1, n_val=1, n_frames=4,
        )
        port = _free_port()
        script = tmp_path / "train_child.py"
        script.write_text(TRAIN_CHILD)
        procs = []
        for pid in range(2):
            env = {
                k: v
                for k, v in os.environ.items()
                # JAX_COMPILATION_CACHE_DIR must NOT reach the children:
                # reloading persisted XLA:CPU AOT executables in a
                # jax.distributed process trips a machine-feature mismatch
                # (cpu_aot_loader) that kills one child and times out the
                # other's gloo init — measured cold=pass(89s) / warm=fail.
                if k not in ("XLA_FLAGS", "JAX_PLATFORMS", "JAX_PLATFORM_NAME",
                             "JAX_COMPILATION_CACHE_DIR")
            }
            env.update(
                JAX_PLATFORMS="cpu",
                JAX_PLATFORM_NAME="cpu",
                XLA_FLAGS="--xla_force_host_platform_device_count=2",
                COORDINATOR_ADDRESS=f"127.0.0.1:{port}",
                NUM_PROCESSES="2",
                PROCESS_ID=str(pid),
                PYTHONPATH=REPO,
            )
            procs.append(
                subprocess.Popen(
                    [sys.executable, str(script), str(data_root),
                     str(tmp_path / f"run{pid}")],
                    env=env, cwd=REPO,
                    stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
                )
            )
        outs = [(p.returncode, *p.communicate(timeout=600)) for p in procs]
        outs = [(p.returncode, o, e) for p, (_, o, e) in zip(procs, outs)]
        for rc, out, err in outs:
            assert rc == 0, err[-3000:]
            assert "MULTIHOST_TRAIN_OK" in out
        # rank 0 wrote the checkpoint + export artifacts (multi-host saves
        # use the msgpack path — orbax barriers would need all ranks)
        assert (tmp_path / "run0" / "export" / "config.json").exists()
        assert (tmp_path / "run0" / "best.msgpack").exists()
