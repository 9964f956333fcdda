"""Sharded serving on the virtual 8-device mesh: the batch fans out over
the data axis and the outputs match the single-device inference contract."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from object_keypoints_tpu.models import KeypointNet
from object_keypoints_tpu.parallel import create_mesh
from object_keypoints_tpu.serving.export import export_model, make_inference_fn
from object_keypoints_tpu.serving.sharded import (
    load_sharded_inference_fn,
    make_sharded_inference_fn,
)

TINY = dict(heatmaps_out=3, features=8, dropout=0.0, stacks=1, levels=2,
            dims=(8, 8, 16), mods=(1, 1, 1), stem_features=(4, 8), cnv_dim=8)


@pytest.fixture(scope="module")
def tiny_model():
    model = KeypointNet(**TINY)
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x, train=False)
    return model, variables


class TestShardedServing:
    def test_matches_single_device(self, tiny_model):
        model, variables = tiny_model
        mesh = create_mesh(model_parallel=1)
        assert mesh.shape["data"] == 8
        rng = np.random.default_rng(0)
        frames = rng.normal(size=(8, 3, 64, 64)).astype(np.float32)

        sharded = make_sharded_inference_fn(model, variables, mesh=mesh)
        single = make_inference_fn(model, variables)
        out_s = sharded(frames)
        out_1 = single(frames)
        for a, b in zip(out_s, out_1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-5, rtol=1e-5)
        # the output really is sharded over the data axis
        shardings = {d.device for d in out_s[0].addressable_shards}
        assert len(shardings) == 8

    def test_artifact_roundtrip(self, tiny_model, tmp_path):
        model, variables = tiny_model
        config = {**TINY, "dims": list(TINY["dims"]), "mods": list(TINY["mods"]),
                  "stem_features": list(TINY["stem_features"]),
                  "input_size": 64, "keypoint_config": [1, 1]}
        export_model(str(tmp_path), config, variables)
        fn = load_sharded_inference_fn(str(tmp_path))
        rng = np.random.default_rng(1)
        frames = rng.normal(size=(8, 3, 64, 64)).astype(np.float32)
        heat, depth, centers = fn(frames)
        assert np.asarray(heat).shape == (8, 3, 8, 8)
        assert np.all(np.isfinite(np.asarray(heat)))

    def test_sharded_int8_serving(self, tiny_model, tmp_path):
        """Sharded serving composes with int8 PTQ: quant.json in the
        artifact -> the sharded fn runs the quantized interceptor under the
        mesh and stays within the int8 accuracy envelope of the
        single-device quantized path."""
        from object_keypoints_tpu.serving.quantize import (
            calibrate_activation_scales,
        )

        model, variables = tiny_model
        rng = np.random.default_rng(3)
        calib = jnp.asarray(rng.normal(size=(2, 64, 64, 3)), jnp.float32)
        scales = calibrate_activation_scales(
            lambda b: model.apply(variables, b, train=False), [calib]
        )
        config = {**TINY, "dims": list(TINY["dims"]), "mods": list(TINY["mods"]),
                  "stem_features": list(TINY["stem_features"]),
                  "input_size": 64, "keypoint_config": [1, 1]}
        export_model(str(tmp_path), config, variables, quant_scales=scales)

        frames = rng.normal(size=(8, 3, 64, 64)).astype(np.float32)
        sharded_q = load_sharded_inference_fn(str(tmp_path))  # auto: int8
        single_q = make_inference_fn(model, variables, quant_scales=scales)
        out_s = sharded_q(frames)
        out_1 = single_q(frames)
        for a, b in zip(out_s, out_1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)

    def test_model_axis_sharding(self, tiny_model):
        """A (4, 2) mesh with wide-kernel channel sharding still reproduces
        the single-device outputs (TP correctness for serving)."""
        model = KeypointNet(**{**TINY, "dims": (8, 8, 512), "features": 8})
        x = jnp.zeros((1, 64, 64, 3), jnp.float32)
        variables = model.init({"params": jax.random.key(0)}, x, train=False)
        mesh = create_mesh(model_parallel=2)
        rng = np.random.default_rng(2)
        frames = rng.normal(size=(4, 3, 64, 64)).astype(np.float32)
        out_s = make_sharded_inference_fn(model, variables, mesh=mesh)(frames)
        out_1 = make_inference_fn(model, variables)(frames)
        for a, b in zip(out_s, out_1):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       atol=1e-4, rtol=1e-4)
