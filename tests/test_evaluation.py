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
