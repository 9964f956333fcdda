"""Training tests: single-batch overfit (the reference's OverfittingTest
notebook semantics — the canonical "does training work" check, SURVEY.md §4)
plus sharded multi-device training on the virtual 8-CPU mesh."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from object_keypoints_tpu.models import KeypointNet
from object_keypoints_tpu.parallel import batch_sharding, create_mesh, shard_params
from object_keypoints_tpu.training.trainer import (
    create_train_state,
    eval_step,
    make_optimizer,
    train_step,
)

TINY = dict(
    levels=2,
    dims=(16, 16, 32),
    mods=(1, 1, 1),
    stem_features=(8, 16),
    cnv_dim=16,
    features=8,
)


def _synthetic_batch(rng, n=2, size=32, k=3):
    """A consistent (frame, targets) batch: gaussian blobs + matching
    depth/center fields."""
    h = w = size // 8
    t = k - 1
    frame = jax.random.normal(rng, (n, size, size, 3)) * 0.1
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    heat = np.zeros((n, h, w, k), np.float32)
    for i in range(k):
        cy, cx = (i + 1) % h, (2 * i + 1) % w
        heat[..., i] = np.exp(-((ys - cy) ** 2 + (xs - cx) ** 2) / 2.0)[None]
    depth = np.clip(heat * 1.5, 0, None)
    centers = np.zeros((n, h, w, t, 2), np.float32)
    centers[..., 0] = 0.5
    return {
        "frame": frame,
        "heatmaps": jnp.asarray(heat),
        "depth": jnp.asarray(depth),
        "centers": jnp.asarray(centers),
    }


class TestOverfit:
    def test_single_batch_overfit(self):
        """Loss must drop substantially in 100 steps on one batch
        (OverfittingTest.ipynb semantics)."""
        model = KeypointNet(heatmaps_out=3, stacks=2, dropout=0.0, **TINY)
        batch = _synthetic_batch(jax.random.key(0))
        variables = model.init({"params": jax.random.key(1)}, batch["frame"], train=False)
        tx = make_optimizer(lr=1e-3, plateau_patience=1000)
        state = create_train_state(model, variables, tx)

        rng = jax.random.key(2)
        first = None
        for i in range(100):
            state, metrics = train_step(model, state, batch, rng)
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(first) and np.isfinite(last)
        assert last < 0.5 * first, (first, last)

    def test_eval_step_metrics(self):
        model = KeypointNet(heatmaps_out=3, stacks=2, dropout=0.0, **TINY)
        batch = _synthetic_batch(jax.random.key(0))
        variables = model.init({"params": jax.random.key(1)}, batch["frame"], train=False)
        state = create_train_state(model, variables, make_optimizer())
        metrics = eval_step(model, state, batch)
        assert "val_loss" in metrics and "total_heatmap_loss" in metrics
        assert 0.0 <= float(metrics["val_loss"]) <= 1.0  # L1 of sigmoid vs [0,1] target

    def test_plateau_reduces_lr(self):
        """The plateau transform must cut the LR multiplier when the loss
        stops improving (reference ReduceLROnPlateau factor=0.1 patience=10,
        scripts/train.py:95-104)."""
        model = KeypointNet(heatmaps_out=3, stacks=1, dropout=0.0, **TINY)
        batch = _synthetic_batch(jax.random.key(0))
        variables = model.init({"params": jax.random.key(1)}, batch["frame"], train=False)
        tx = make_optimizer(lr=0.0, plateau_factor=0.1, plateau_patience=2)
        state = create_train_state(model, variables, tx)
        rng = jax.random.key(2)
        for _ in range(8):  # lr=0 -> loss constant -> plateau trips
            state, _ = train_step(model, state, batch, rng)
        assert float(state.lr_scale) < 1.0


class TestDeviceData:
    """Device-resident data path (training/device_data.py): the store +
    in-step target rendering must reproduce the host pipeline's step."""

    def test_step_matches_host_pipeline(self, tmp_path, calibration_file):
        """Same frames, augment off: one train step through the device
        store must produce the host-pipeline step's loss (same init, same
        dropout stream). Exercises store build (iter_prefix), in-jit
        normalize + target render, and the shared train core."""
        pytest.importorskip("cv2")
        from object_keypoints_tpu.data.combinators import batched
        from object_keypoints_tpu.data.scene import SceneDataset
        from object_keypoints_tpu.data.synthetic import write_synthetic_sequence
        from object_keypoints_tpu.training.device_data import (
            build_device_store, train_step_device_data,
        )

        seq = tmp_path / "seq_00"
        write_synthetic_sequence(str(seq), calibration_file,
                                 keypoint_config=[1, 3], n_objects=1,
                                 n_frames=2, seed=11)
        config = {"keypoint_config": [1, 3]}
        ds_host = SceneDataset(str(seq), config, augment=False,
                               normalize=False)
        ds_store = SceneDataset(str(seq), config, augment=False,
                                normalize=False)

        model = KeypointNet(heatmaps_out=3, stacks=1, dropout=0.0, **TINY)
        batch = next(batched(ds_host, 2))
        variables = model.init({"params": jax.random.key(1)},
                               jnp.zeros((1, *batch["frame"].shape[1:]),
                                         model.dtype), train=False)
        tx = make_optimizer(lr=1e-3, plateau_patience=1000)
        rng = jax.random.key(2)

        # donation in train_step deletes the state's buffers — give each
        # path its own copy of the (identical) init
        variables_d = jax.tree.map(jnp.copy, variables)
        state_h = create_train_state(model, variables, tx)
        _, metrics_h = train_step(model, state_h, batch, rng)

        store = build_device_store([ds_store])
        assert store.n_frames == 2 and bool(store.valid.all())
        state_d = create_train_state(model, variables_d, tx)
        _, metrics_d = train_step_device_data(
            model, state_d, store, jnp.asarray([0, 1]), rng,
            keypoint_config=(1, 1, 3), augment=False,
        )
        host_loss, dev_loss = float(metrics_h["loss"]), float(metrics_d["loss"])
        assert host_loss == pytest.approx(dev_loss, rel=1e-4), \
            (host_loss, dev_loss)

    def test_augmented_step_trains(self, tmp_path, calibration_file):
        """With augmentation on, repeated steps on the store must reduce
        the loss (the production flagship path)."""
        pytest.importorskip("cv2")
        from object_keypoints_tpu.data.scene import SceneDataset
        from object_keypoints_tpu.data.synthetic import write_synthetic_sequence
        from object_keypoints_tpu.training.device_data import (
            build_device_store, train_step_device_data,
        )

        seq = tmp_path / "seq_00"
        write_synthetic_sequence(str(seq), calibration_file,
                                 keypoint_config=[1, 3], n_objects=1,
                                 n_frames=2, seed=12)
        ds = SceneDataset(str(seq), {"keypoint_config": [1, 3]},
                          augment=True, normalize=False)
        store = build_device_store([ds])
        model = KeypointNet(heatmaps_out=3, stacks=1, dropout=0.0, **TINY)
        variables = model.init({"params": jax.random.key(1)},
                               jnp.zeros((1, *np.asarray(store.frames).shape[1:3], 3),
                                         model.dtype), train=False)
        state = create_train_state(model, variables,
                                   make_optimizer(lr=1e-3,
                                                  plateau_patience=1000))
        rng = jax.random.key(3)
        idx = jnp.asarray([0, 1])
        first = None
        for i in range(30):
            state, metrics = train_step_device_data(
                model, state, store, idx, rng, keypoint_config=(1, 1, 3),
            )
            if i == 0:
                first = float(metrics["loss"])
        last = float(metrics["loss"])
        assert np.isfinite(last) and last < first, (first, last)


class TestValBatchCache:
    def test_val_pipeline_rendered_once(self, tmp_path, calibration_file,
                                        monkeypatch):
        """The val split is deterministic, so training/loop.py materializes
        its rendered batches on the first epoch and replays them — the host
        must not re-decode/re-render val every epoch (~67 ms/frame on this
        1-core host). The non-shuffled Chain is constructed exactly once
        per run by _val_batches; train-path Chains pass shuffle=True."""
        pytest.importorskip("cv2")
        from object_keypoints_tpu.data.combinators import Chain
        from object_keypoints_tpu.data.synthetic import make_synthetic_dataset_tree
        from object_keypoints_tpu.training import loop as loop_mod

        train_dir, val_dir = make_synthetic_dataset_tree(
            str(tmp_path / "data"), calibration_file, [1, 3],
            n_train=1, n_val=1, n_frames=2,
        )
        counts = {"val_chains": 0}

        class CountingChain(Chain):
            def __init__(self, datasets, shuffle=False, **kwargs):
                if not shuffle:
                    counts["val_chains"] += 1
                super().__init__(datasets, shuffle=shuffle, **kwargs)

        monkeypatch.setattr(loop_mod, "Chain", CountingChain)
        result = loop_mod.train(loop_mod.TrainConfig(
            train=train_dir, val=val_dir, keypoint_config=[1, 3],
            batch_size=2, lr=1e-3, features=8, dropout=0.0, pool=4,
            epochs=3, out_dir=str(tmp_path / "run"), log_every=100,
            ckpt_every=100, model_overrides=dict(
                levels=2, dims=(16, 16, 32), mods=(1, 1, 1),
                stem_features=(8, 16), cnv_dim=16),
        ))
        assert np.isfinite(result["best_val_loss"])
        assert counts["val_chains"] == 1, counts


class TestUint8FrameIngest:
    def test_device_normalizer_matches_host(self):
        """uint8 frames through the jitted steps must score identically to
        host-normalized float frames (trainer.prepare_frames does the same
        f32 math on device; training/loop.py ships uint8 to cut transfer)."""
        from object_keypoints_tpu.constants import RGB_MEAN, RGB_STD

        model = KeypointNet(heatmaps_out=3, stacks=1, dropout=0.0, **TINY)
        batch = _synthetic_batch(jax.random.key(0))
        u8 = np.random.default_rng(0).integers(
            0, 256, size=(2, 32, 32, 3), dtype=np.uint8
        )
        batch_u8 = dict(batch, frame=jnp.asarray(u8))
        batch_f32 = dict(
            batch,
            frame=jnp.asarray((u8.astype(np.float32) / 255.0 - RGB_MEAN) / RGB_STD),
        )
        variables = model.init(
            {"params": jax.random.key(1)}, batch_f32["frame"], train=False
        )
        state = create_train_state(model, variables, make_optimizer())
        m_u8 = eval_step(model, state, batch_u8)
        m_f32 = eval_step(model, state, batch_f32)
        np.testing.assert_allclose(
            float(m_u8["val_loss"]), float(m_f32["val_loss"]), rtol=1e-6
        )
        _, metrics = train_step(model, state, batch_u8, jax.random.key(2))
        assert np.isfinite(float(metrics["loss"]))


class TestShardedTraining:
    def test_data_parallel_matches_single_device(self):
        """One sharded step over the 8-device mesh must equal the
        single-device step (global-view SPMD correctness)."""
        assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
        model = KeypointNet(heatmaps_out=3, stacks=1, dropout=0.0, **TINY)
        batch = _synthetic_batch(jax.random.key(0), n=8)
        variables = model.init({"params": jax.random.key(1)}, batch["frame"], train=False)
        tx = make_optimizer(lr=1e-3, plateau_patience=1000)

        # train_step donates its state buffers; keep an unshared copy for
        # the sharded run before the first step consumes `variables`.
        variables_copy = jax.tree.map(jnp.copy, variables)

        # single device
        state_a = create_train_state(model, variables, tx)
        state_a, metrics_a = train_step(model, state_a, batch, jax.random.key(2))

        # 4x2 mesh: batch over data, wide kernels over model
        mesh = create_mesh(model_parallel=2)
        sharded_batch = jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
        )
        state_b = create_train_state(model, variables_copy, tx)
        state_b = state_b.replace(params=shard_params(state_b.params, mesh))
        state_b, metrics_b = train_step(model, state_b, sharded_batch, jax.random.key(2))

        np.testing.assert_allclose(
            float(metrics_a["loss"]), float(metrics_b["loss"]), rtol=1e-4
        )
        # grad norms must agree; per-parameter post-Adam comparison is not
        # meaningful (first-step sign normalization amplifies fp noise).
        np.testing.assert_allclose(
            float(metrics_a["grad_norm"]), float(metrics_b["grad_norm"]), rtol=1e-2
        )
        # a second step must also agree on the loss trajectory
        state_a, metrics_a2 = train_step(model, state_a, batch, jax.random.key(3))
        state_b, metrics_b2 = train_step(model, state_b, sharded_batch, jax.random.key(3))
        np.testing.assert_allclose(
            float(metrics_a2["loss"]), float(metrics_b2["loss"]), rtol=1e-3
        )


class TestCheckpointBestTracking:
    """save_if_best/flush_best semantics: best is tracked per epoch, the
    disk write amortizes to the checkpoint cadence, and best_val survives
    re-runs into the same directory (a resumed run's first — worse —
    validation must not overwrite a stored best)."""

    class _State:
        def __init__(self, value):
            self.params = {"w": np.full((2,), value, np.float32)}
            self.batch_stats = {}
            self.opt_state = ()

    def test_deferred_best_flush_and_sidecar(self, tmp_path):
        from object_keypoints_tpu.training.checkpoints import CheckpointManager

        ckpt = CheckpointManager(str(tmp_path))
        # epoch 1: val 0.5 (best so far), deferred -> nothing on disk yet
        assert ckpt.save_if_best(self._State(1.0), 1, 0.5, defer=True)
        import os

        assert not os.path.exists(tmp_path / "best")
        # epoch 2: worse -> stash unchanged
        assert not ckpt.save_if_best(self._State(2.0), 2, 0.7, defer=True)
        ckpt.flush_best()
        best = ckpt.restore("best")
        assert float(best["val_loss"]) == 0.5
        np.testing.assert_array_equal(best["params"]["w"], [1.0, 1.0])

        # a NEW manager over the same dir recovers best_val from the
        # sidecar: a worse first validation must not steal "best"
        ckpt2 = CheckpointManager(str(tmp_path))
        assert ckpt2.best_val == 0.5
        assert not ckpt2.save_if_best(self._State(3.0), 3, 0.6, defer=True)
        ckpt2.flush_best()  # no stash -> no-op
        best = ckpt2.restore("best")
        np.testing.assert_array_equal(best["params"]["w"], [1.0, 1.0])
        # a genuinely better epoch still wins
        assert ckpt2.save_if_best(self._State(4.0), 4, 0.1, defer=True)
        ckpt2.flush_best()
        best = ckpt2.restore("best")
        assert float(best["val_loss"]) == 0.1
        np.testing.assert_array_equal(best["params"]["w"], [4.0, 4.0])
