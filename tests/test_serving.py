"""Serving artifact tests: export -> load roundtrip must reproduce the
source model bit-for-bit, and the inference contract must match the
reference's TorchScript layout (scripts/package_model.py:26-42)."""

import numpy as np
import jax
import jax.numpy as jnp

from object_keypoints_tpu.models import KeypointNet
from object_keypoints_tpu.serving.export import (
    export_model,
    load_inference_fn,
    load_model,
    make_inference_fn,
)

TINY = dict(
    levels=2, dims=(16, 16, 32), mods=(1, 1, 1), stem_features=(8, 16),
    cnv_dim=16, features=8,
)
CONFIG = {"heatmaps_out": 3, "features": 8, "dropout": 0.0,
          "keypoint_config": [1, 3], **{k: list(v) if isinstance(v, tuple) else v
                                        for k, v in TINY.items() if k != "features"}}


def _fresh(seed=0):
    model = KeypointNet(heatmaps_out=3, dropout=0.0, **TINY)
    x = jnp.zeros((1, 64, 64, 3))
    variables = model.init({"params": jax.random.key(seed)}, x, train=False)
    return model, variables


class TestExportRoundtrip:
    def test_params_roundtrip_exact(self, tmp_path):
        model, variables = _fresh()
        export_model(str(tmp_path), CONFIG, variables)
        _, restored, config = load_model(str(tmp_path))
        assert config["keypoint_config"] == [1, 3]
        for a, b in zip(jax.tree_util.tree_leaves(variables["params"]),
                        jax.tree_util.tree_leaves(restored["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_inference_contract(self, tmp_path):
        model, variables = _fresh(1)
        export_model(str(tmp_path), CONFIG, variables)
        infer = load_inference_fn(str(tmp_path))
        frames = np.random.default_rng(0).normal(size=(2, 3, 64, 64)).astype(np.float32)
        heat, depth, centers = infer(jnp.asarray(frames))
        # reference layout: (N, K, h, w), (N, K, h, w), (N, T, 2, h, w)
        assert heat.shape == (2, 3, 8, 8)
        assert depth.shape == (2, 3, 8, 8)
        assert centers.shape == (2, 2, 2, 8, 8)
        assert (np.asarray(heat) >= 0).all() and (np.asarray(heat) <= 1).all()

    def test_loaded_matches_source_model(self, tmp_path):
        model, variables = _fresh(2)
        export_model(str(tmp_path), CONFIG, variables)
        infer_src = make_inference_fn(model, variables)
        infer_loaded = load_inference_fn(str(tmp_path))
        frames = jnp.asarray(
            np.random.default_rng(1).normal(size=(1, 3, 64, 64)).astype(np.float32)
        )
        for a, b in zip(infer_src(frames), infer_loaded(frames)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

    def test_no_tmp_leftover(self, tmp_path):
        """Atomic write: no .tmp file survives a successful export."""
        model, variables = _fresh(3)
        export_model(str(tmp_path), CONFIG, variables)
        leftovers = [p for p in tmp_path.iterdir() if p.name.endswith(".tmp")]
        assert not leftovers
