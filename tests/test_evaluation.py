"""Evaluation tests: ground-truth-mode pipeline through the Results
accumulator must report sub-centimeter errors on synthetic data (the
reference eval_model --ground-truth sanity path)."""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from object_keypoints_tpu.data.synthetic import write_synthetic_sequence
from object_keypoints_tpu.evaluation import Results, Sequence, evaluate_sequence
from object_keypoints_tpu.pipeline import ObjectKeypointPipeline
from object_keypoints_tpu.utils.ros import message_to_transform, transform_to_message


@pytest.fixture(scope="module")
def sequence_dir(tmp_path_factory, calibration_file):
    out = tmp_path_factory.mktemp("eval_seq") / "seq"
    write_synthetic_sequence(
        str(out), calibration_file, keypoint_config=[1, 3], n_frames=4, seed=11,
    )
    return str(out)


class TestGroundTruthEval:
    def test_ground_truth_mode_subcentimeter(self, sequence_dir):
        config = {"keypoint_config": [1, 3]}
        sequence = Sequence(sequence_dir, config)
        pipeline = ObjectKeypointPipeline((64, 64), sequence.keypoints, config)
        results = evaluate_sequence(sequence, pipeline, ground_truth=True, max_frames=3)
        summary = results.print_results()
        assert summary["n_points"] > 0
        # decoding the *rendered ground truth* maps must recover 3D keypoints
        # to a few cm (64x64 quantization + depth-disc readout bound it)
        assert summary["mean_cm"] < 5.0, summary
        assert summary["missing_pct"] <= 50.0

    def test_results_empty(self):
        results = Results()
        assert results.summary() == {"n_points": 0}


class TestRosUtils:
    def test_transform_roundtrip(self):
        rng = np.random.default_rng(0)
        from scipy.spatial.transform import Rotation

        for _ in range(5):
            T = np.eye(4)
            T[:3, :3] = Rotation.random(random_state=int(rng.integers(1 << 31))).as_matrix()
            T[:3, 3] = rng.normal(size=3)
            msg = transform_to_message(T, "a", "b", 0.0)
            T2 = message_to_transform(msg)
            np.testing.assert_allclose(T2, T, atol=1e-9)


class TestFastEval:
    def test_fast_path_matches_gt_quality(self, sequence_dir):
        """The batched fast path driven by an oracle 'inference' (returns
        the rendered ground-truth maps) must reach the same sub-5cm quality
        as the reference-API path."""
        import jax.numpy as jnp
        import numpy as np

        from object_keypoints_tpu.evaluation import evaluate_sequence_fast

        config = {"keypoint_config": [1, 3]}
        sequence = Sequence(sequence_dir, config)

        examples = list(sequence.dataset)

        def oracle(frames_nchw):
            # look up the matching pre-rendered targets by frame count order
            n = frames_nchw.shape[0]
            heat = np.stack([np.transpose(e["heatmaps"], (2, 0, 1)) for e in oracle.queue[:n]])
            depth = np.stack([np.transpose(e["depth"], (2, 0, 1)) for e in oracle.queue[:n]])
            centers = np.stack([np.transpose(e["centers"], (2, 3, 0, 1)) for e in oracle.queue[:n]])
            oracle.queue = oracle.queue[n:]
            return jnp.asarray(heat), jnp.asarray(depth), jnp.asarray(centers)

        oracle.queue = examples + examples  # padding may re-read the tail
        results = evaluate_sequence_fast(sequence, oracle, config, batch_size=4)
        summary = results.summary()
        assert summary["n_points"] > 0
        assert summary["mean_cm"] < 5.0, summary
