import sys, time
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/benchmarks")
import importlib.util, json
spec = importlib.util.spec_from_file_location("run_all", "/root/repo/benchmarks/run_all.py")
m = importlib.util.module_from_spec(spec)
spec.loader.exec_module(m)

print(json.dumps(m.bench_video_eval(True)), flush=True)

# investigate train-step time with explicit per-step walls
import numpy as np, jax, jax.numpy as jnp
from object_keypoints_tpu.models import KeypointNet
from object_keypoints_tpu.training.trainer import create_train_state, make_optimizer, train_step

model = KeypointNet(heatmaps_out=3, dropout=0.0, dtype=jnp.bfloat16)
rng = np.random.default_rng(0)
heat = np.zeros((4, 64, 64, 3), np.float32)
batch = {
    "frame": jnp.asarray(rng.normal(size=(4, 511, 511, 3)), jnp.bfloat16),
    "heatmaps": jnp.asarray(heat),
    "depth": jnp.asarray(heat),
    "centers": jnp.zeros((4, 64, 64, 2, 2), jnp.float32),
}
variables = model.init({"params": jax.random.key(0)}, batch["frame"], train=False)
state = create_train_state(model, variables, make_optimizer(lr=1e-3, plateau_patience=10_000))
key = jax.random.key(1)
for i in range(6):
    t0 = time.perf_counter()
    state, metrics = train_step(model, state, batch, key)
    jax.block_until_ready(metrics["loss"])
    print(f"train step {i}: {time.perf_counter()-t0:.3f}s loss={float(metrics['loss']):.3f}", flush=True)
