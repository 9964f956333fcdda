"""The full training loop: data -> sharded steps -> validation -> checkpoints.

Orchestration parity with scripts/train.py:45-179 (KeypointModule +
DataModule + Trainer): per-sequence SceneDatasets chained + shuffle-pooled
(train.py:132-139), AdamW + plateau schedule monitoring train loss, val
metric = L1(sigmoid(heatmap[-1]), target), ModelCheckpoint top-1 on
val_loss. TPU-first: one mesh over all local devices, batch sharded over
``data``, threaded device prefetch, bf16 compute optional.
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from object_keypoints_tpu.data.combinators import Chain, SamplingPool, batched
from object_keypoints_tpu.data.prefetch import device_prefetch
from object_keypoints_tpu.data.scene import SceneDataset
from object_keypoints_tpu.models import KeypointNet
from object_keypoints_tpu.parallel import batch_sharding, create_mesh
from object_keypoints_tpu.serving.export import export_model
from object_keypoints_tpu.training.checkpoints import CheckpointManager
from object_keypoints_tpu.training.trainer import (
    create_train_state,
    eval_step,
    make_optimizer,
    train_step,
)
from object_keypoints_tpu.utils.metrics import MetricsLogger, print_metrics


@dataclasses.dataclass
class TrainConfig:
    """Flags parity with scripts/train.py:17-33 (defaults included)."""

    train: str = ""
    val: str = ""
    keypoint_config: Sequence[int] = (1, 1, 1)
    batch_size: int = 8
    lr: float = 4e-3
    weight_decay: float = 0.01
    features: int = 128
    center_weight: float = 1.0
    depth_weight: float = 10.0
    dropout: float = 0.1
    pool: int = 1000
    epochs: int = 10
    steps_per_epoch: Optional[int] = None  # None = exhaust the chain
    bf16: bool = False  # reference --fp16; bf16 is the TPU-native choice
    seed: int = 0
    out_dir: str = "runs/keypoints"
    resume: Optional[str] = None
    log_every: int = 10
    # also write a TensorBoard event file next to metrics.jsonl (the
    # reference's Lightning TensorBoard logger, scripts/train.py:67-91)
    tensorboard: bool = False
    ckpt_every: int = 1  # checkpoint every N epochs (orbax IO is ~30 s/save here)
    # plateau schedule: the reference steps ReduceLROnPlateau once per EPOCH
    # on the epoch-mean train loss (scripts/train.py:95-104). The optax
    # transform sees per-step values, so it must average ~an epoch of steps
    # per comparison; patience then counts epochs, like the reference.
    plateau_patience: int = 10
    plateau_accumulation: int = 50
    # reference --resume semantics: reload weights but build a FRESH
    # optimizer/schedule (Lightning re-creates the optimizer on fit);
    # set False to continue the optimizer state exactly.
    resume_fresh_optimizer: bool = True
    # Device-resident training data (training/device_data.py): stage the
    # decoded dataset in HBM once and run augment+target-render inside the
    # jitted step — each step ships only a (B,) index vector. Measured 9.2
    # -> see README for the e2e table. None = auto: on for a single-device
    # mesh when the frames fit the budget below; OKT_DEVICE_DATA=0/1
    # overrides. The host pipeline stays the exact-parity reference path
    # (and the only option for multi-device/multi-host training).
    device_data: Optional[bool] = None
    device_data_budget_bytes: int = 8 << 30
    # model-size overrides (full CornerNet-Squeeze geometry by default)
    model_overrides: Optional[dict] = None

    @property
    def heatmaps_out(self) -> int:
        return len(list(self.keypoint_config)) + 1


def _build_sequences(root: str, keypoint_config, seed: Optional[int] = None,
                     **kwargs):
    """Per-sequence datasets; ``seed`` makes the augmentation streams
    deterministic (the reference seeds its DataLoader workers the same way,
    scripts/train.py:41-43)."""
    dirs = sorted(os.path.join(root, d) for d in os.listdir(root))
    return [
        SceneDataset(
            d, {"keypoint_config": list(keypoint_config)},
            seed=None if seed is None else seed + i, **kwargs,
        )
        for i, d in enumerate(dirs)
    ]


def build_model(config: TrainConfig) -> KeypointNet:
    overrides = dict(config.model_overrides or {})
    return KeypointNet(
        heatmaps_out=config.heatmaps_out,
        features=config.features,
        dropout=config.dropout,
        dtype=jnp.bfloat16 if config.bf16 else jnp.float32,
        **overrides,
    )


def train(config: TrainConfig) -> dict:
    """Run training; returns {'best_val_loss', 'steps', 'checkpoint_dir'}."""
    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    devices = jax.devices()
    n_proc = jax.process_count()
    if n_proc > 1:
        # multi-host SPMD (the reference's DDP, corner_net_lite/
        # train.py:193-247): config.batch_size is PER PROCESS; the global
        # batch (batch * n_proc) shards over every process's devices, and
        # each process samples its own data (per-process seeds) — DDP's
        # per-worker sampling. Gradients/BN stats reduce globally inside
        # the jitted step via GSPMD.
        if (config.batch_size * n_proc) % len(devices):
            raise ValueError(
                f"global batch {config.batch_size * n_proc} not divisible by "
                f"{len(devices)} devices"
            )
        mesh = create_mesh(devices=devices, model_parallel=1)
    else:
        # data-parallel over the largest device subset the batch divides
        n_data = max(d for d in range(1, len(devices) + 1)
                     if config.batch_size % d == 0)
        mesh = create_mesh(devices=devices[:n_data], model_parallel=1)
    sharding = batch_sharding(mesh)
    is_main = jax.process_index() == 0
    model = build_model(config)

    data_seed = config.seed + 1009 * jax.process_index()
    # normalize=False: frames cross host->device as uint8 (4x less traffic
    # — the dominant wall-step cost on a tunneled chip); the jitted steps
    # normalize on device (trainer.prepare_frames, numerically identical)
    # The training loop is the one multi-epoch consumer, so it opts into the
    # decoded-frame prefix cache (the SceneDataset default is off);
    # OKT_CACHE_FRAMES=0 disables it for sequences too long to hold in RAM.
    cache_frames = os.environ.get("OKT_CACHE_FRAMES", "1") == "1"
    train_sets = _build_sequences(config.train, config.keypoint_config,
                                  seed=data_seed, augment=True,
                                  normalize=False, cache_frames=cache_frames)
    val_sets = _build_sequences(config.val, config.keypoint_config,
                                augment=False, include_pose=True,
                                normalize=False, cache_frames=cache_frames)

    rng = jax.random.key(config.seed)
    init_rng, dropout_rng = jax.random.split(rng)
    sample = next(iter(train_sets[0]))
    frame_shape = (1, *sample["frame"].shape)
    variables = model.init(
        {"params": init_rng}, jnp.zeros(frame_shape, model.dtype), train=False
    )
    tx = make_optimizer(
        lr=config.lr, weight_decay=config.weight_decay,
        plateau_patience=config.plateau_patience,
        plateau_accumulation=config.plateau_accumulation,
    )
    state = create_train_state(model, variables, tx)

    hparams = dataclasses.asdict(config)
    hparams["keypoint_config"] = list(config.keypoint_config)
    ckpt = CheckpointManager(config.out_dir, hparams=hparams)
    if config.resume:
        restored = CheckpointManager(config.resume).restore(
            "last",
            template={"params": state.params, "batch_stats": state.batch_stats,
                      "opt_state": state.opt_state, "step": 0},
        )
        state = state.replace(
            params=restored["params"], batch_stats=restored["batch_stats"],
            step=jnp.asarray(restored["step"], jnp.int32),
        )
        if config.resume_fresh_optimizer:
            state = state.replace(opt_state=tx.init(state.params))
        else:
            state = state.replace(opt_state=restored["opt_state"])

    if n_proc > 1:
        # place the (identical-per-process) state as replicated GLOBAL
        # arrays so the jitted step sees one consistent SPMD program
        from jax.sharding import NamedSharding, PartitionSpec

        state = jax.device_put(state, NamedSharding(mesh, PartitionSpec()))

    logger = (MetricsLogger(config.out_dir, tensorboard=config.tensorboard)
              if is_main else None)
    step = int(state.step)

    # --- device-resident data path (single-device mesh only) ---
    use_device_data = config.device_data
    n_mesh_devices = len(list(np.asarray(mesh.devices).flat))
    frame_bytes = int(np.prod(sample["frame"].shape))
    total_frames = sum(len(s) for s in train_sets)
    if use_device_data is None:
        env = os.environ.get("OKT_DEVICE_DATA")
        if env in ("0", "1"):
            use_device_data = env == "1"
        else:
            use_device_data = (
                n_proc == 1 and n_mesh_devices == 1
                and total_frames * frame_bytes <= config.device_data_budget_bytes
            )
    store = None
    if use_device_data:
        if n_proc > 1 or n_mesh_devices > 1:
            raise ValueError(
                "device_data=True needs a single-device mesh; the host "
                "pipeline is the multi-device/multi-host path"
            )
        from object_keypoints_tpu.training.device_data import (
            build_device_store, train_step_device_data,
        )

        store = build_device_store(train_sets)
        jax.block_until_ready(store.frames)
        target_config = tuple(train_sets[0].keypoint_config)
        perm_rng = np.random.default_rng(data_seed)
        if is_main:
            print(f"device store: {total_frames} frames, "
                  f"{total_frames * frame_bytes / 1e6:.0f} MB staged in HBM")

    def _train_batches():
        chain = Chain(train_sets, shuffle=True, seed=data_seed)
        pooled = SamplingPool(chain, config.pool, seed=data_seed)
        yield from batched(pooled, config.batch_size)

    # The val split is deterministic (no augmentation), so the rendered
    # batches are identical every epoch — but streaming them re-pays host
    # target rendering per epoch (~67 ms/frame on this 1-core host, which
    # at 100 val frames x 120 epochs is ~13 min of pure recompute).
    # Materialize them once and replay; bounded to a 512 MB budget (val
    # frames are uint8 here), OKT_CACHE_VAL=0 opts out.
    _val_cache = []
    _val_cacheable = (
        os.environ.get("OKT_CACHE_VAL", "1") == "1"
        and sum(len(s) for s in val_sets) * frame_bytes <= 512 * 1024 ** 2
    )

    def _val_batches():
        if _val_cache:
            yield from _val_cache
            return
        chain = Chain(val_sets)
        # pose extras are host-side metadata; the eval_step batch needs the
        # tensor fields only. The tail batch is padded (cyclically) up to the
        # full batch size so eval_step compiles exactly ONE shape — a ragged
        # tail would trigger a fresh multi-minute jit compile per distinct
        # size on this host (full-model compile is 2-6 min).
        vb = config.batch_size * 2
        for b in batched(chain, vb, drop_last=False):
            b = {k: b[k] for k in ("frame", "heatmaps", "depth", "centers")}
            n = len(b["frame"])
            if n < vb:
                idx = np.resize(np.arange(n), vb)
                b = {k: np.asarray(v)[idx] for k, v in b.items()}
            if _val_cacheable:
                if store is not None:
                    # device-data mode (single-device): keep the cached val
                    # batches in HBM too — skips the per-epoch host->device
                    # upload (~80 MB over the tunnel at 100 val frames).
                    # eval_step does not donate, so the arrays are reusable.
                    b = jax.tree.map(jnp.asarray, b)
                _val_cache.append(b)
            yield b

    def _device_data_batches():
        """Index batches over the device store: a full per-epoch shuffle
        (the pooled-shuffle approximation exists only to bound host RAM,
        which the store makes moot)."""
        order = perm_rng.permutation(store.n_frames)
        for start in range(0, store.n_frames - config.batch_size + 1,
                           config.batch_size):
            yield jnp.asarray(order[start:start + config.batch_size])

    for epoch in range(config.epochs):
        epoch_steps = 0
        if store is not None:
            batches = _device_data_batches()
        else:
            batches = device_prefetch(_train_batches(), sharding=sharding)
        for batch in batches:
            if store is not None:
                state, metrics = train_step_device_data(
                    model, state, store, batch, dropout_rng,
                    keypoint_config=target_config,
                    depth_weight=config.depth_weight,
                    center_weight=config.center_weight,
                )
            else:
                state, metrics = train_step(
                    model, state, batch, dropout_rng,
                    depth_weight=config.depth_weight,
                    center_weight=config.center_weight,
                )
            # sync on the loss scalar every step: queueing donated steps
            # back-to-back stalls the axon runtime (~400x; see
            # benchmarks/run_all.py bench_overfit note)
            jax.block_until_ready(metrics["loss"])
            step += 1
            epoch_steps += 1
            if step % config.log_every == 0:
                host = {k: float(v) for k, v in metrics.items()}
                host["lr_scale"] = float(state.lr_scale)
                if logger:
                    logger.log(step, host)
                if is_main:
                    print_metrics(step, {"loss": host["loss"]}, extra=f"epoch={epoch}")
            if config.steps_per_epoch and epoch_steps >= config.steps_per_epoch:
                break

        # validation epoch (scripts/train.py:77-93 metric names)
        val_metrics = []
        for batch in device_prefetch(
            _val_batches(), sharding=sharding if n_proc > 1 else None
        ):
            val_metrics.append(
                {k: float(v) for k, v in eval_step(
                    model, state, batch,
                    depth_weight=config.depth_weight,
                    center_weight=config.center_weight,
                ).items()}
            )
        mean_val = {k: float(np.mean([m[k] for m in val_metrics]))
                    for k in val_metrics[0]} if val_metrics else {"val_loss": np.inf}
        if logger:
            logger.log(step, mean_val)
        if is_main:
            print_metrics(step, {"val_loss": mean_val["val_loss"]},
                          extra=f"epoch={epoch} [val]")

        if is_main:
            # best is tracked EVERY epoch (ModelCheckpoint top-1 parity —
            # gating it on ckpt_every would let the true best epoch slip
            # through); only the slow disk write amortizes to the cadence.
            ckpt.save_if_best(state, step, mean_val["val_loss"], defer=True)
            if (epoch + 1) % config.ckpt_every == 0 or epoch == config.epochs - 1:
                ckpt.save_last(state, step)
                ckpt.flush_best()

    # serving artifact from the BEST checkpoint — reference semantics:
    # package_model.py loads the Lightning checkpoint and ModelCheckpoint
    # keeps top-1 on val_loss (scripts/train.py:170-172), so packaging
    # serves the best epoch, not the last. The final step can be much
    # worse when the optimizer oscillates late in training.
    export_dir = os.path.join(config.out_dir, "export")
    if is_main:
        export_vars = {"params": state.params, "batch_stats": state.batch_stats}
        if np.isfinite(ckpt.best_val):
            # templateless restore: reads old (with opt_state) and new
            # (serving-only) best payloads alike
            restored = ckpt.restore("best")
            export_vars = {"params": restored["params"],
                           "batch_stats": restored["batch_stats"]}
        export_model(
            export_dir,
            {
                "heatmaps_out": config.heatmaps_out,
                "features": config.features,
                "dropout": config.dropout,
                "keypoint_config": list(config.keypoint_config),
                **(config.model_overrides or {}),
            },
            export_vars,
        )
    if logger:
        logger.close()
    return {
        "best_val_loss": ckpt.best_val,
        "steps": step,
        "checkpoint_dir": config.out_dir,
        "export_dir": export_dir,
    }
