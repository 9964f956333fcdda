"""End-to-end integration: synthetic dataset -> training loop -> checkpoint
+ serving export -> LearnedKeypointTrackingPipeline inference."""

import pathlib

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from object_keypoints_tpu.data.synthetic import make_synthetic_dataset_tree

# module fixture trains a real model to convergence (~4 min); default runs include this — deselect with -m 'not slow'
pytestmark = pytest.mark.slow


TINY_OVERRIDES = dict(
    levels=2,
    dims=(16, 16, 32),
    mods=(1, 1, 1),
    stem_features=(8, 16),
    cnv_dim=16,
)


@pytest.fixture(scope="module")
def dataset_tree(tmp_path_factory, calibration_file):
    root = tmp_path_factory.mktemp("synth")
    train_dir, val_dir = make_synthetic_dataset_tree(
        str(root), calibration_file, keypoint_config=[1, 3],
        n_train=2, n_val=1, n_frames=8,
    )
    return train_dir, val_dir


@pytest.fixture(scope="module")
def train_result(dataset_tree, tmp_path_factory):
    """Trains to actual (loose) convergence — ~3.5 min on this 1-core host —
    so the learned-accuracy gate below is meaningful. Measured on this
    recipe: best_val ~0.005, learned-mode eval mean_cm ~4.3."""
    from object_keypoints_tpu.training.loop import TrainConfig, train

    train_dir, val_dir = dataset_tree
    out = tmp_path_factory.mktemp("run")
    config = TrainConfig(
        train=train_dir,
        val=val_dir,
        keypoint_config=[1, 3],
        batch_size=4,
        lr=1.5e-2,
        features=8,
        dropout=0.0,
        pool=16,
        epochs=22,
        out_dir=str(out),
        model_overrides=TINY_OVERRIDES,
        log_every=50,
        ckpt_every=4,
    )
    return train(config), config


class TestTrainingLoop:
    def test_produces_checkpoints_and_export(self, train_result):
        result, config = train_result
        import os

        assert result["steps"] >= 2
        assert np.isfinite(result["best_val_loss"])
        assert os.path.isdir(os.path.join(config.out_dir, "best"))
        assert os.path.isdir(os.path.join(config.out_dir, "last"))
        assert os.path.isfile(os.path.join(config.out_dir, "hparams.json"))
        assert os.path.isfile(os.path.join(result["export_dir"], "config.json"))
        assert os.path.isfile(os.path.join(config.out_dir, "metrics.jsonl"))

    def test_export_serves_best_checkpoint(self, train_result):
        """Reference semantics: package_model.py serves the ModelCheckpoint
        top-1 on val_loss (scripts/train.py:170-172), so the export must
        hold the BEST checkpoint's params, not the final step's."""
        from object_keypoints_tpu.serving.export import load_model
        from object_keypoints_tpu.training.checkpoints import CheckpointManager

        result, config = train_result
        import jax

        _, exported, _ = load_model(result["export_dir"])
        best = CheckpointManager(config.out_dir).restore("best")
        for a, b in zip(
            jax.tree.leaves(exported["params"]), jax.tree.leaves(best["params"])
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_resume_restores_step(self, train_result, tmp_path):
        from object_keypoints_tpu.training.loop import TrainConfig, train

        result, config = train_result
        resumed = TrainConfig(
            **{**config.__dict__, "resume": config.out_dir,
               "out_dir": str(tmp_path / "resumed"), "epochs": 1}
        )
        r2 = train(resumed)
        assert r2["steps"] > result["steps"]

    def test_exported_model_runs_pipeline(self, train_result, dataset_tree):
        """The serving artifact must drive the full tracking pipeline
        (reference eval_model serve path)."""
        from object_keypoints_tpu.data.scene import SceneDataset
        from object_keypoints_tpu.pipeline import LearnedKeypointTrackingPipeline

        result, config = train_result
        _, val_dir = dataset_tree
        import os

        seq = os.path.join(val_dir, sorted(os.listdir(val_dir))[0])
        ds = SceneDataset(seq, {"keypoint_config": [1, 3]}, include_pose=True)

        # prediction-space camera (eval_model.py:61-69)
        offset = SceneDataset.image_offset
        camera = ds.camera.scale(511.0 / 720.0).cut(offset).scale(64.0 / 511.0)

        pipeline = LearnedKeypointTrackingPipeline(
            result["export_dir"], False, [64, 64], None,
            {"keypoint_config": [1, 3]},
        )
        pipeline.reset(camera)

        example = next(iter(ds))
        frame = np.transpose(example["frame"], (2, 0, 1))[None]  # NCHW contract
        objects, heatmap = pipeline(frame)
        assert heatmap.shape == (1, 3, 8, 8) or heatmap.shape[1] == 3
        assert isinstance(objects, list)

    def test_model_bench_example(self, train_result, dataset_tree, tmp_path):
        """examples/model_bench.py (the ModelBench.ipynb analog) renders
        overlay frames from the trained artifact."""
        import os
        import subprocess
        import sys as _sys

        result, config = train_result
        _, val_dir = dataset_tree
        seq_dir = os.path.join(val_dir, sorted(os.listdir(val_dir))[0])
        repo = pathlib.Path(__file__).resolve().parent.parent
        out = tmp_path / "bench_vis"
        # Force the child onto CPU: the suite env's JAX_PLATFORMS=axon would
        # otherwise make it grab (or hang waiting for) the real TPU chip.
        env = dict(os.environ, JAX_PLATFORMS="cpu", JAX_PLATFORM_NAME="cpu",
                   OKT_PLATFORM="cpu")
        proc = subprocess.run(
            [_sys.executable, str(repo / "examples" / "model_bench.py"),
             seq_dir, "--model", result["export_dir"],
             "--keypoints", str(repo / "config" / "valve.json"),
             "--out", str(out), "--max-frames", "2"],
            capture_output=True, text=True, timeout=420, cwd=str(repo), env=env,
        )
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert (out / "000000.jpg").exists()
        assert (out / "000001.jpg").exists()

    def test_learned_model_accuracy(self, train_result, dataset_tree):
        """The learned serve path must actually be accurate: train -> export
        -> learned-mode evaluate_sequence -> assert the 3D error budget.
        This is the automated stand-in for the reference's manual
        eval_model.py run (eval_model.py:129-232); a broken serve path
        (or diverged training) shows up as mean_cm ~75 with hundreds of
        spurious detections, vs ~4 cm / ~28 points when healthy."""
        import os

        from object_keypoints_tpu import evaluation
        from object_keypoints_tpu.pipeline import LearnedKeypointTrackingPipeline

        result, config = train_result
        _, val_dir = dataset_tree
        seq_dir = os.path.join(val_dir, sorted(os.listdir(val_dir))[0])
        seq = evaluation.Sequence(seq_dir, {"keypoint_config": [1, 3]})
        pipeline = LearnedKeypointTrackingPipeline(
            result["export_dir"], False, [64, 64], None,
            {"keypoint_config": [1, 3]},
        )
        results = evaluation.evaluate_sequence(
            seq, pipeline, ground_truth=False, max_frames=8
        )
        summary = results.summary()
        assert summary["n_points"] > 0, "learned pipeline detected nothing"
        assert summary["mean_cm"] < 15.0, summary
        assert summary["missing_pct"] < 25.0, summary
        # no detection explosion: ~4 GT points/frame over <=8 frames
        assert summary["n_points"] <= 60, summary
