"""int8 post-training quantization gates (serving/quantize.py).

The bench serves int8 by default, so these tests are the standing accuracy
gate: the quantized serve path must stay within the BASELINE.md parity
budgets (≤1 px peaks, ≤5 mm 3D) of the float path it replaces.
"""

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import pytest

from object_keypoints_tpu.models import KeypointNet
from object_keypoints_tpu.serving import quantize as Q
from object_keypoints_tpu.serving.export import (
    export_model,
    load_inference_fn,
    load_quant_scales,
    make_inference_fn,
)


def small_model():
    return KeypointNet(
        heatmaps_out=3, features=32, dims=(32, 32, 48, 48, 64),
        stacks=2, dtype=jnp.float32,
    )


@pytest.fixture(scope="module")
def calibrated():
    model = small_model()
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 127, 127, 3)), jnp.float32)
    variables = model.init({"params": jax.random.key(0)}, x[:1], train=False)
    scales = Q.calibrate_activation_scales(
        lambda b: model.apply(variables, b, train=False), [x]
    )
    return model, variables, scales, x


class TestCalibration:
    def test_covers_eligible_convs(self, calibrated):
        model, variables, scales, x = calibrated
        assert len(scales) > 20  # the hourglass has many convs
        assert all(s > 0 for s in scales.values())
        # the hourglass unpool ConvTranspose layers are eligible too
        assert any("up2" in path for path in scales)
        # depthwise fire-module branches are not eligible and never recorded:
        # every recorded path must correspond to a feature_group_count==1 conv,
        # which we verify by running the quantized path without error below.

    def test_rejects_jitted_calibration(self, calibrated):
        model, variables, _, x = calibrated
        jit_apply = jax.jit(lambda b: model.apply(variables, b, train=False))
        with pytest.raises(RuntimeError, match="eagerly"):
            Q.calibrate_activation_scales(lambda b: jit_apply(b), [x])


class TestAccuracy:
    def test_serving_outputs_close(self, calibrated):
        """Quantized (sigmoid heat, depth, centers) vs float: within the
        parity budgets that gate the decode path (heat in probability units,
        depth in meters)."""
        model, variables, scales, x = calibrated
        ref = model.apply(variables, x, train=False)
        out = jax.jit(
            lambda b: Q.quantized_apply(model, variables, scales, b, train=False)
        )(x)
        for stack in range(2):
            heat_d = np.abs(
                jax.nn.sigmoid(np.asarray(ref[0][stack], np.float32))
                - jax.nn.sigmoid(np.asarray(out[0][stack], np.float32))
            ).max()
            depth_d = np.abs(
                np.asarray(ref[1][stack], np.float32) - np.asarray(out[1][stack], np.float32)
            ).max()
            cent_d = np.abs(
                np.asarray(ref[2][stack], np.float32) - np.asarray(out[2][stack], np.float32)
            ).max()
            assert heat_d < 0.02, heat_d  # probability units
            assert depth_d < 0.005, depth_d  # meters: the 5 mm gate
            assert cent_d < 0.25, cent_d  # pixels (64x64 map): << 1 px gate

    def test_percentile_calibration_tighter_than_max(self, calibrated):
        """Percentile scales must be <= max-abs scales and still quantize to
        comparable accuracy (outliers get clipped, the bulk gets finer
        resolution)."""
        model, variables, scales, x = calibrated
        p_scales = Q.calibrate_activation_scales(
            lambda b: model.apply(variables, b, train=False), [x], percentile=99.5
        )
        assert set(p_scales) == set(scales)
        assert all(p_scales[k] <= scales[k] + 1e-6 for k in scales)
        assert any(p_scales[k] < scales[k] * 0.999 for k in scales)
        ref = model.apply(variables, x, train=False)
        out = jax.jit(
            lambda b: Q.quantized_apply(model, variables, p_scales, b, train=False)
        )(x)
        heat_d = np.abs(
            jax.nn.sigmoid(np.asarray(ref[0][-1], np.float32))
            - jax.nn.sigmoid(np.asarray(out[0][-1], np.float32))
        ).max()
        assert heat_d < 0.03, heat_d

    def test_per_channel_calibration(self, calibrated):
        """Per-input-channel activation scales (folded into the kernel) must
        be at least as accurate as per-tensor on the same calibration set."""
        model, variables, scales, x = calibrated
        c_scales = Q.calibrate_activation_scales(
            lambda b: model.apply(variables, b, train=False), [x], per_channel=True
        )
        assert set(c_scales) == set(scales)
        some = next(iter(c_scales.values()))
        assert isinstance(some, list) and len(some) > 1
        # channel max-abs never exceeds the tensor max-abs
        for k in scales:
            assert max(c_scales[k]) <= scales[k] + 1e-5
        ref = model.apply(variables, x, train=False)
        out_t = jax.jit(
            lambda b: Q.quantized_apply(model, variables, scales, b, train=False)
        )(x)
        out_c = jax.jit(
            lambda b: Q.quantized_apply(model, variables, c_scales, b, train=False)
        )(x)

        def heat_err(out):
            return np.abs(
                jax.nn.sigmoid(np.asarray(ref[0][-1], np.float32))
                - jax.nn.sigmoid(np.asarray(out[0][-1], np.float32))
            ).max()

        assert heat_err(out_c) < 0.02
        assert heat_err(out_c) <= heat_err(out_t) * 1.5  # no regression

    def test_stem_int8_handoff_numerics_unchanged(self, calibrated):
        """The stem int8 handoff (pre_conv/pre_res1 outputs stored int8,
        consumer convs fed directly) must be numerically identical to the
        unfused path — the consumers see the exact same quantized values."""
        model, variables, scales, x = calibrated
        with_h = jax.jit(
            lambda b: Q.quantized_apply(model, variables, scales, b,
                                        train=False, handoffs=Q.STEM_HANDOFFS)
        )(x)
        without_h = jax.jit(
            lambda b: Q.quantized_apply(model, variables, scales, b,
                                        train=False, handoffs={})
        )(x)
        for a, b in zip(jax.tree.leaves(with_h), jax.tree.leaves(without_h)):
            np.testing.assert_allclose(
                np.asarray(a, np.float32), np.asarray(b, np.float32),
                atol=1e-4, rtol=1e-4,
            )

    def test_small_input_convs_left_in_float(self):
        """Convs with < min_in_features input channels (e.g. the 3-channel
        stem) bypass quantization entirely — bitwise equal to float."""
        conv = nn.Conv(8, (3, 3), padding=[(1, 1), (1, 1)], use_bias=False)
        x = jnp.asarray(np.random.default_rng(1).normal(size=(1, 9, 9, 3)), jnp.float32)
        v = conv.init(jax.random.key(0), x)
        scales = Q.calibrate_activation_scales(lambda b: conv.apply(v, b), [x])
        out = Q.quantized_apply(conv, v, scales, x)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(conv.apply(v, x)))


class TestPlacement:
    """The measured-default int8 placement (benchmarks/quant_skip_sweep.py):
    hourglass interior stays bf16 (DEFAULT_SKIP_SUBSTRINGS), overridable
    via OKT_INT8_SKIP."""

    def test_default_skip_predicate(self, monkeypatch):
        monkeypatch.delenv("OKT_INT8_SKIP", raising=False)
        pred = Q.default_skip()
        assert pred("backbone/hg_0/up1_0/Conv_0") and not pred("backbone/pre_res1/Conv_0")
        monkeypatch.setenv("OKT_INT8_SKIP", "")
        assert Q.default_skip() is None  # empty override = quantize everything
        monkeypatch.setenv("OKT_INT8_SKIP", "pre_res,_head_")
        pred = Q.default_skip()
        assert pred("backbone/pre_res1/Conv_0") and pred("heatmap_head_0/conv0")
        assert not pred("backbone/hg_0/up1_0/Conv_0")

    def test_default_placement_keeps_hourglass_float(self, calibrated, monkeypatch):
        """skip=None must apply the measured default (hg stays bf16):
        bitwise-equal to the explicit /hg_ predicate, different from
        quantize-everything."""
        monkeypatch.delenv("OKT_INT8_SKIP", raising=False)
        model, variables, scales, x = calibrated
        default = Q.quantized_apply(model, variables, scales, x, train=False)
        explicit = Q.quantized_apply(model, variables, scales, x, train=False,
                                     skip=lambda p: "/hg_" in p)
        everything = Q.quantized_apply(model, variables, scales, x, train=False,
                                       skip=lambda p: False)
        for a, b in zip(jax.tree.leaves(default), jax.tree.leaves(explicit)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert any(
            np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32)).max() > 0
            for a, b in zip(jax.tree.leaves(default), jax.tree.leaves(everything))
        )


class TestArtifact:
    def test_export_roundtrip_with_scales(self, calibrated, tmp_path):
        model, variables, scales, x = calibrated
        config = {
            "heatmaps_out": 3, "features": 32, "dims": [32, 32, 48, 48, 64],
            "stacks": 2, "input_size": 127, "keypoint_config": [1, 1],
        }
        export_model(str(tmp_path), config, variables, quant_scales=scales)
        assert load_quant_scales(str(tmp_path)) == pytest.approx(scales)

        nchw = jnp.transpose(x, (0, 3, 1, 2))
        ref = make_inference_fn(model, variables)(nchw)
        auto = load_inference_fn(str(tmp_path))(nchw)  # picks up quant.json
        never = load_inference_fn(str(tmp_path), quantize="never")(nchw)
        assert np.abs(np.asarray(ref[0]) - np.asarray(auto[0])).max() < 0.02
        np.testing.assert_allclose(
            np.asarray(ref[0]), np.asarray(never[0]), rtol=0, atol=1e-6
        )

    def test_require_raises_without_scales(self, calibrated, tmp_path):
        model, variables, _, _ = calibrated
        config = {
            "heatmaps_out": 3, "features": 32, "dims": [32, 32, 48, 48, 64],
            "stacks": 2, "input_size": 127, "keypoint_config": [1, 1],
        }
        export_model(str(tmp_path), config, variables)
        with pytest.raises(FileNotFoundError):
            load_inference_fn(str(tmp_path), quantize="require")
