"""Weekly-tier flagship-geometry accuracy gate.

Trains the DEFAULT 24.95M-param KeypointNet (features 128 — the real
reference geometry, scripts/train.py:22-31 upstream) on a synthetic valve
set and asserts the learned-mode 3D error budget, closing the gap between
the CI tiny-geometry gate (tests/test_end_to_end.py, dims (16,16,32)) and
the model users actually train.

This is NOT part of the default suite: it needs the real accelerator
(full-geometry training is pathological on the 1-core CPU host) and takes
~15-25 min. Opt in with OKT_FLAGSHIP_TESTS=1:

    OKT_FLAGSHIP_TESTS=1 python -m pytest tests/test_flagship.py -q -m flagship

The training subprocess strips the suite's CPU pinning so it runs on the
machine's default platform (the TPU here). Recorded reference result for
this exact recipe lives in README "Trained accuracy" (larger dataset,
same geometry): mean 3D err ~6 cm, 0% missing.
"""

import json
import os
import pathlib
import subprocess
import sys

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.flagship]

REPO_ROOT = pathlib.Path(__file__).resolve().parent.parent

_DRIVER = """
import json, sys
from object_keypoints_tpu.data.synthetic import make_synthetic_dataset_tree
from object_keypoints_tpu.training.loop import TrainConfig, train
from object_keypoints_tpu import evaluation
from object_keypoints_tpu.pipeline import LearnedKeypointTrackingPipeline
import os

root = sys.argv[1]
train_dir, val_dir = make_synthetic_dataset_tree(
    os.path.join(root, "data"), "config/calibration.yaml", [1, 3],
    n_train=6, n_val=1, n_frames=40,
)
result = train(TrainConfig(
    train=train_dir, val=val_dir, keypoint_config=[1, 3],
    batch_size=8, lr=4e-3, features=128, dropout=0.1, pool=200,
    epochs=50, bf16=True, seed=1, out_dir=os.path.join(root, "run"),
    log_every=50, ckpt_every=10,
))
seq_dir = os.path.join(val_dir, sorted(os.listdir(val_dir))[0])
seq = evaluation.Sequence(seq_dir, {"keypoint_config": [1, 3]})
pipeline = LearnedKeypointTrackingPipeline(
    result["export_dir"], False, [64, 64], None, {"keypoint_config": [1, 3]},
)
results = evaluation.evaluate_sequence(seq, pipeline, ground_truth=False)
summary = results.summary()
print("FLAGSHIP_JSON " + json.dumps(
    {"best_val_loss": result["best_val_loss"], **summary}))
"""


@pytest.mark.skipif(
    os.environ.get("OKT_FLAGSHIP_TESTS") != "1",
    reason="weekly tier: needs the real accelerator for ~20 min; "
    "set OKT_FLAGSHIP_TESTS=1",
)
def test_flagship_geometry_accuracy(tmp_path):
    env = dict(os.environ)
    # undo the suite's CPU pinning (tests/conftest.py) for the child:
    # full-geometry training belongs on the accelerator
    for var in ("JAX_PLATFORMS", "JAX_PLATFORM_NAME", "XLA_FLAGS",
                "JAX_COMPILATION_CACHE_DIR", "OKT_PLATFORM"):
        env.pop(var, None)
    proc = subprocess.run(
        [sys.executable, "-c", _DRIVER, str(tmp_path)],
        cwd=REPO_ROOT, env=env, capture_output=True, text=True,
        timeout=3600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("FLAGSHIP_JSON ")]
    assert line, proc.stdout[-4000:]
    summary = json.loads(line[-1].split(" ", 1)[1])

    # training must genuinely converge at full geometry...
    assert summary["best_val_loss"] < 8e-3, summary
    # ...and the learned serve path must hit the 3D error budget
    # (reference protocol: eval_model.py:192-232 metrics)
    assert summary["n_points"] > 0, summary
    assert summary["mean_cm"] < 12.0, summary
    assert summary["missing_pct"] < 10.0, summary
