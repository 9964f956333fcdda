"""End-to-end stereo inference benchmark on the local accelerator.

Measures the reference serve path (scripts/eval_model.py §3.2 call stack) as
ONE jitted XLA program per batch of stereo pairs:

    frames (2B, 511, 511, 3) bf16
      -> KeypointNet forward (CornerNet-Squeeze hourglass + 3 heads)
      -> sigmoid heatmaps -> peak extraction -> center association
      -> capacity resolution -> depth-lookup unprojection to 3D.

Metric: stereo pairs per second, end-to-end (both views fully decoded).
Baseline: the driver-set north star of 500 stereo frames/sec/chip
(BASELINE.md) — the reference itself publishes no numbers.

Serving dtype: int8 post-training quantization by default (the production
serving mode, serving/quantize.py; eligible convs run int8 on the MXU,
~1.3x over bf16 on this chip). Activation scales are calibrated on REAL
rendered frames read back through SceneDataset — the same path
scripts/package_model.py uses in production — not random noise. Decoded 3D
outputs stay within the 5 mm parity gate vs the float path — gated in
tests/test_quantize.py every run.

Each run measures BOTH serve architectures and prints TWO JSON lines:
the stereo-triangulated path (forward both views -> epipolar match ->
Hartley-Sturm/DLT, pipeline/stereo_jit.py) first, then the headline
depth-head path LAST (the driver parses the final line). Set
OKT_BENCH_MODE=stereo to make the triangulated path the headline,
OKT_BENCH_BOTH=0 to measure only the headline mode,
OKT_BENCH_QUANT=0 for bf16, OKT_BENCH_PAIRS=<n> for batch.

Weights: random init by default (cross-round comparability — every
BENCH_r*.json used it). Set OKT_BENCH_PARAMS=<export_dir> to load a
trained serving artifact (scripts/train.py export/ or package_model.py
output) so the decode tail sees a real peak population; the model config
must be the valve topology the decode stage is built for (heatmaps_out 3).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp


PAIRS = int(os.environ.get("OKT_BENCH_PAIRS", "48"))  # sweep r2: 32/48/64 -> 1133/1153/1158 pairs/s; 48 = near-best at 2/3 the memory
QUANT = os.environ.get("OKT_BENCH_QUANT", "1") != "0"
MODE = os.environ.get("OKT_BENCH_MODE", "depth")  # depth | stereo (headline)
BOTH = os.environ.get("OKT_BENCH_BOTH", "1") != "0"
WARMUP = 3
ITERS = 20
BASELINE_FPS = 500.0


def _calibration_batch(keypoint_config=(1, 3), n_frames=8):
    """Real-frame int8 calibration through the scripts/package_model.py
    production collector (serving/calibration.py): render a synthetic
    sequence to disk, read it back through SceneDataset (normalization +
    511 resize), calibrate on those frames."""
    import tempfile

    from object_keypoints_tpu.data.synthetic import write_synthetic_sequence
    from object_keypoints_tpu.serving.calibration import collect_calibration_frames

    with tempfile.TemporaryDirectory() as td:
        write_synthetic_sequence(
            os.path.join(td, "seq"), "config/calibration.yaml",
            list(keypoint_config), n_frames=n_frames, seed=7,
        )
        frames = collect_calibration_frames([td], keypoint_config,
                                            n_frames=n_frames)
    assert frames, "synthetic calibration sequence failed to read back"
    return np.stack(frames)


def build(mode, apply_fn, nhwc_outputs_to_reference, params, cam, offset):
    from object_keypoints_tpu.pipeline.decode_jit import (
        CameraArrays,
        _decode_objects_impl,
    )

    keypoint_config = (1, 3)

    if mode == "stereo":
        from object_keypoints_tpu.geometry import FisheyeCamera, StereoCamera
        from object_keypoints_tpu.pipeline.stereo_jit import (
            StereoRigArrays,
            stereo_decode_triangulate,
        )

        right = (
            FisheyeCamera(params["Kp"], params["Dp"], params["image_size"])
            .scale(511.0 / 720.0)
            .cut(offset)
            .scale(64.0 / 511.0)
        )
        rig = StereoRigArrays.from_stereo_camera(
            StereoCamera(cam, right, params["T_RL"])
        )

        @jax.jit
        def step(frames):
            outs = apply_fn(frames)
            heat, _, _ = nhwc_outputs_to_reference(outs, stack=-1)
            heat = heat.astype(jnp.float32)
            decoded = jax.vmap(
                lambda l, r: stereo_decode_triangulate(
                    l, r, rig, max_peaks=16, epipolar_threshold=3.0
                )
            )(heat[:PAIRS], heat[PAIRS:])
            return decoded.points_3d, decoded.match_valid

        return step

    camera = CameraArrays(
        K=jnp.asarray(cam.K, jnp.float32),
        D=jnp.asarray(cam.D, jnp.float32),
        Kinv=jnp.asarray(cam.Kinv, jnp.float32),
        image_size=jnp.asarray(cam.image_size, jnp.float32),
    )

    @jax.jit
    def step(frames):
        outs = apply_fn(frames)
        heat, depth, centers = nhwc_outputs_to_reference(outs, stack=-1)
        heat = heat.astype(jnp.float32)
        depth = depth.astype(jnp.float32)
        centers = centers.astype(jnp.float32)
        decoded = jax.vmap(
            lambda p, d, o: _decode_objects_impl(
                p, d, o, camera, keypoint_config, "equidistant", 16, 20.0, 0.5
            )
        )(heat, depth, centers)
        return decoded.center_p3d, decoded.keypoints_p3d, decoded.keypoints_valid

    return step


def measure(step, frames):
    for _ in range(WARMUP):
        out = step(frames)
    jax.block_until_ready(out)

    profile_dir = os.environ.get("OKT_BENCH_PROFILE")
    if profile_dir:
        with jax.profiler.trace(profile_dir):
            out = step(frames)
            jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = step(frames)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return PAIRS * ITERS / dt


def report(mode, pairs_per_sec):
    path = (
        "forward both views+epipolar match+triangulate"
        if mode == "stereo"
        else "forward+decode+3D"
    )
    print(
        json.dumps(
            {
                "metric": "stereo_pairs_per_sec_triangulated"
                if mode == "stereo"
                else "stereo_pairs_per_sec_e2e",
                "value": round(pairs_per_sec, 2),
                "unit": "stereo pairs/s (1 chip, 511x511, %s, %s%s)"
                % ("int8-PTQ serve" if QUANT else "bf16", path,
                   ", trained weights" if os.environ.get("OKT_BENCH_PARAMS")
                   else ""),
                "vs_baseline": round(pairs_per_sec / BASELINE_FPS, 3),
            }
        ),
        flush=True,
    )


def main():
    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from object_keypoints_tpu.geometry import FisheyeCamera, load_calibration_params
    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.models.keypoint_net import nhwc_outputs_to_reference

    params = load_calibration_params("config/calibration.yaml")
    # camera chain into 64x64 prediction space (scripts/eval_model.py:61-69)
    offset = np.array([(511.0 / 720.0 * 1280.0 - 511.0) / 2.0, 0.0])
    cam = (
        FisheyeCamera(params["K"], params["D"], params["image_size"])
        .scale(511.0 / 720.0)
        .cut(offset)
        .scale(64.0 / 511.0)
    )

    shape = (2 * PAIRS, 511, 511, 3)
    params_dir = os.environ.get("OKT_BENCH_PARAMS")
    if params_dir:
        from object_keypoints_tpu.serving.export import load_model

        model, variables, config = load_model(params_dir, dtype=jnp.bfloat16)
        assert config["heatmaps_out"] == 3, (
            f"bench decode stage is valve-topology ([1, 3] -> 3 maps); "
            f"artifact has heatmaps_out={config['heatmaps_out']}"
        )
    else:
        model = KeypointNet(heatmaps_out=3, dtype=jnp.bfloat16)  # valve topology [1, 3]
        variables = model.init(
            {"params": jax.random.key(0)}, jnp.zeros((1,) + shape[1:], jnp.bfloat16),
            train=False,
        )

    if QUANT:
        from object_keypoints_tpu.serving.quantize import (
            calibrate_activation_scales,
            quantized_apply,
        )

        calib = jnp.asarray(_calibration_batch(), jnp.bfloat16)
        scales = calibrate_activation_scales(
            lambda b: model.apply(variables, b, train=False), [calib]
        )
        apply_fn = lambda f: quantized_apply(model, variables, scales, f, train=False)
    else:
        apply_fn = lambda f: model.apply(variables, f, train=False)

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.normal(size=shape), jnp.bfloat16)

    secondary = "stereo" if MODE != "stereo" else "depth"
    modes = ([secondary] if BOTH else []) + [MODE]  # headline LAST
    for mode in modes:
        step = build(
            mode, apply_fn, nhwc_outputs_to_reference, params, cam, offset
        )
        report(mode, measure(step, frames))


if __name__ == "__main__":
    main()
