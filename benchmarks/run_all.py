#!/usr/bin/env python
"""The five BASELINE.md measurement configs (+ the stereo e2e serve path),
one JSON line each.

1. single-image valve heatmap inference (CornerNet-Squeeze backbone, valve
   topology)                                  -> images/s + latency
2. stereo-pair 3D triangulation pipeline (undistort -> Hartley-Sturm ->
   DLT, config/calibration.yaml)              -> point-pairs/s + 3D parity
3. heatmap-loss training overfit run (OverfittingTest semantics)
                                              -> steps/s + loss ratio
4. multi-object cups scene with keypoint association (config/cups.json)
                                              -> frames/s through decode
5. batched video-sequence eval (eval_model semantics over an encoded
   synthetic sequence)                        -> frames/s end-to-end
6. stereo end-to-end serve: forward both views -> epipolar match ->
   Hartley-Sturm/DLT as ONE program           -> stereo pairs/s + mm parity
7. CornerNet_Saccade two-stage attention drive (downsized pass -> zoom
   crops on device -> second pass -> merge)   -> images/s

Usage: python benchmarks/run_all.py [--quick]
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def _time(fn, iters, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def bench_single_image_inference(iters):
    """Config 1: single valve frame through the full network."""
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.models.keypoint_net import nhwc_outputs_to_reference

    model = KeypointNet(heatmaps_out=3, dtype=jnp.bfloat16)
    frame = jnp.zeros((1, 511, 511, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.key(0)}, frame, train=False)

    @jax.jit
    def step(frame):
        return nhwc_outputs_to_reference(model.apply(variables, frame, train=False))

    dt = _time(lambda: step(frame), iters)
    return {"metric": "valve_single_image_inference", "value": round(1.0 / dt, 2),
            "unit": "images/s (batch 1, 511x511, bf16)",
            "latency_ms": round(dt * 1000, 3)}


def bench_stereo_triangulation(iters):
    """Config 2: the full stereo 2D->3D lift on real calibration."""
    import jax.numpy as jnp

    from object_keypoints_tpu.geometry import (
        FisheyeCamera, StereoCamera, linalg, load_calibration_params,
    )
    from object_keypoints_tpu.geometry.stereo import triangulate_pixels

    params = load_calibration_params("config/calibration.yaml")
    left = FisheyeCamera(params["K"], params["D"], params["image_size"])
    right = FisheyeCamera(params["Kp"], params["Dp"], params["image_size"])
    rig = StereoCamera(left, right, params["T_RL"])

    rng = np.random.default_rng(0)
    pts = rng.uniform([-0.4, -0.3, 0.7], [0.4, 0.3, 2.0], size=(256, 3))
    p_l = left.project(pts)
    p_r = right.project(np.asarray(linalg.transform_points(rig.T_RL, pts)))

    args = [jnp.asarray(a, jnp.float32) for a in (
        p_l, p_r, left.K, left.D, right.K, right.D, rig.T_RL, rig.F)]

    import jax

    f = jax.jit(lambda a, b: triangulate_pixels(a, b, *args[2:]))
    dt = _time(lambda: f(args[0], args[1]), iters)
    recon = np.asarray(f(args[0], args[1]))
    err = float(np.linalg.norm(recon - pts, axis=1).max())
    return {"metric": "stereo_triangulation", "value": round(256 / dt, 1),
            "unit": "point-pairs/s (undistort+correct+DLT)",
            "max_err_m": round(err, 6)}


def bench_overfit(iters):
    """Config 3: heatmap-loss training speed + convergence check."""
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.training.trainer import (
        create_train_state, make_optimizer, train_step,
    )

    model = KeypointNet(heatmaps_out=3, dropout=0.0, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    heat = np.zeros((4, 64, 64, 3), np.float32)
    heat[:, 20, 20, 0] = 1.0
    heat[:, 30, 40, 1] = 1.0
    batch = {
        "frame": jnp.asarray(rng.normal(size=(4, 511, 511, 3)), jnp.bfloat16),
        "heatmaps": jnp.asarray(heat),
        "depth": jnp.asarray(heat * 1.5),
        "centers": jnp.zeros((4, 64, 64, 2, 2), jnp.float32),
    }
    variables = model.init({"params": jax.random.key(0)}, batch["frame"], train=False)
    state = create_train_state(model, variables, make_optimizer(lr=1e-3,
                                                                plateau_patience=10_000))
    key = jax.random.key(1)
    # two warmup steps: donation aliasing makes the second call a distinct
    # compile variant; steady state starts at step 2
    state, first = train_step(model, state, batch, key)
    first_loss = float(first["loss"])
    state, warm = train_step(model, state, batch, key)
    jax.block_until_ready(warm["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        state, metrics = train_step(model, state, batch, key)
        # block each step: queueing donated steps back-to-back stalls the
        # axon runtime pathologically (measured 10 ms/step blocked vs
        # ~4.5 s/step free-running — the donated-buffer reuse path)
        jax.block_until_ready(metrics["loss"])
    dt = (time.perf_counter() - t0) / iters
    return {"metric": "overfit_train_step", "value": round(1.0 / dt, 2),
            "unit": "steps/s (batch 4, 511x511, bf16, full model)",
            "loss_ratio": round(float(metrics["loss"]) / first_loss, 4)}


def bench_cups_association(iters):
    """Config 4: multi-object decode + association on cups topology."""
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.data import targets as T
    from object_keypoints_tpu.geometry import FisheyeCamera, load_calibration_params
    from object_keypoints_tpu.pipeline.decode_jit import CameraArrays, decode_objects_batch

    params = load_calibration_params("config/calibration.yaml")
    offset = np.array([(511.0 / 720.0 * 1280.0 - 511.0) / 2.0, 0.0])
    cam = (FisheyeCamera(params["K"], params["D"], params["image_size"])
           .scale(511.0 / 720.0).cut(offset).scale(64.0 / 511.0))
    camera = CameraArrays(
        K=jnp.asarray(cam.K, jnp.float32), D=jnp.asarray(cam.D, jnp.float32),
        Kinv=jnp.asarray(cam.Kinv, jnp.float32),
        image_size=jnp.asarray(cam.image_size, jnp.float32),
    )

    # three cups, analytic targets
    config = (1, 1, 1, 1)  # center + cups.json [1,1,1]
    world = np.array([
        [0.0, 0.0, 1.0], [0.05, 0.0, 1.0], [-0.05, 0.05, 1.0], [0.0, -0.05, 1.0],
        [-0.4, 0.0, 1.2], [-0.35, 0.0, 1.2], [-0.45, 0.05, 1.2], [-0.4, -0.05, 1.2],
    ])
    pts = cam.project(world).reshape(2, 4, 2)
    p_C = world.reshape(2, 4, 3)
    heat, depth, centers = T.render_all_targets(
        jnp.asarray(pts, jnp.float32), jnp.asarray(p_C, jnp.float32),
        jnp.ones((2, 4), bool), config, (64, 64),
    )
    B = 32
    heat_b = jnp.broadcast_to(heat[None], (B, *heat.shape))
    depth_b = jnp.broadcast_to(depth[None], (B, *depth.shape))
    centers_b = jnp.broadcast_to(centers[None], (B, *centers.shape))

    f = lambda: decode_objects_batch(heat_b, depth_b, centers_b, camera,
                                     (1, 1, 1), max_peaks=16)
    dt = _time(f, iters)
    decoded = f()
    n_obj = int(np.asarray(decoded.center_valid[0]).sum())
    return {"metric": "cups_association_decode", "value": round(B / dt, 1),
            "unit": "frames/s (decode+assoc+3D, 2 objects, batch 32)",
            "objects_found": n_obj}


def bench_stereo_e2e(iters, pairs=16):
    """Config 6: the TRUE stereo architecture end to end — KeypointNet
    forward on both views, epipolar matching, Hartley-Sturm + DLT
    triangulation — as ONE jitted program (the path BASELINE.md config #2
    names; restored from the reference's stale stereo tests,
    test/test_pipeline.py:171-261). Includes a <=5 mm parity assertion of
    the jitted geometry vs the host component chain."""
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.data import targets as T
    from object_keypoints_tpu.geometry import (
        FisheyeCamera, StereoCamera, linalg, load_calibration_params,
    )
    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.models.keypoint_net import nhwc_outputs_to_reference
    from object_keypoints_tpu.pipeline.components import (
        AssociationComponent, KeypointExtractionComponent, TriangulationComponent,
    )
    from object_keypoints_tpu.pipeline.stereo_jit import (
        StereoRigArrays, stereo_decode_triangulate,
    )

    params = load_calibration_params("config/calibration.yaml")
    offset = np.array([(511.0 / 720.0 * 1280.0 - 511.0) / 2.0, 0.0])

    def small(K, D):
        # camera chain into 64x64 prediction space (eval_model.py:61-69)
        return (FisheyeCamera(K, D, params["image_size"])
                .scale(511.0 / 720.0).cut(offset).scale(64.0 / 511.0))

    left = small(params["K"], params["D"])
    right = small(params["Kp"], params["Dp"])
    rig_host = StereoCamera(left, right, params["T_RL"])
    rig = StereoRigArrays.from_stereo_camera(rig_host)

    # ---- parity: analytic heatmaps through jit chain vs host chain ----
    world = np.array([[0.0, 0.0, 1.0], [0.25, 0.15, 1.0],
                      [-0.25, -0.25, 1.0], [0.25, -0.25, 1.0]])
    with_center = np.vstack([world.mean(axis=0, keepdims=True), world])
    p_l = left.project(with_center)
    p_r = right.project(
        np.asarray(linalg.transform_points(params["T_RL"], with_center))
    )
    heats = [
        np.asarray(T.render_heatmaps(
            jnp.asarray(p[None], jnp.float32), jnp.ones((1, len(p)), bool),
            (1, 1, 3), (64, 64),
        ))
        for p in (p_l, p_r)
    ]
    out = stereo_decode_triangulate(
        jnp.asarray(heats[0]), jnp.asarray(heats[1]), rig,
        max_peaks=8, epipolar_threshold=3.0,
    )
    jit_valid = np.asarray(out.match_valid)
    jit_left = np.asarray(out.points_left)
    jit_p3 = np.asarray(out.points_3d)

    extraction = KeypointExtractionComponent(
        {"keypoint_config": [1, 3]}, (64, 64), max_peaks=8
    )
    (kp_l, _), (kp_r, _) = extraction(heats[0][None], heats[1][None])
    assoc = AssociationComponent(threshold=3.0)
    assoc.reset(rig_host)
    tri = TriangulationComponent()
    tri.reset(rig_host)
    max_dev = 0.0
    n_checked = 0
    for c in range(3):
        L, R = kp_l[0][c], kp_r[0][c]
        if not L or not R:
            continue
        a = assoc(np.stack(L), np.stack(R))
        for i, j in enumerate(a):
            if j < 0:
                continue
            p3d_host = tri(np.asarray(L[i])[None], np.asarray(R[j])[None])[0]
            # find the jit slot holding the same left detection
            d_slots = np.linalg.norm(jit_left[c] - np.asarray(L[i]), axis=1)
            k = int(d_slots.argmin())
            if d_slots[k] < 0.5 and jit_valid[c, k]:
                max_dev = max(max_dev, float(np.linalg.norm(jit_p3[c, k] - p3d_host)))
                n_checked += 1
    assert n_checked >= 4, f"parity check matched only {n_checked} points"
    assert max_dev < 5e-3, f"jit-vs-host stereo deviation {max_dev * 1000:.2f} mm"

    # ---- throughput: forward both views + stereo decode as one program ----
    model = KeypointNet(heatmaps_out=3, dtype=jnp.bfloat16)
    frames = jnp.zeros((2 * pairs, 511, 511, 3), jnp.bfloat16)
    variables = model.init({"params": jax.random.key(0)}, frames[:1], train=False)

    @jax.jit
    def step(frames):
        outs = model.apply(variables, frames, train=False)
        heat, _, _ = nhwc_outputs_to_reference(outs, stack=-1)  # (2B, K, 64, 64)
        heat = heat.astype(jnp.float32)
        decoded = jax.vmap(
            lambda l, r: stereo_decode_triangulate(
                l, r, rig, max_peaks=8, epipolar_threshold=3.0
            )
        )(heat[:pairs], heat[pairs:])
        return decoded.points_3d, decoded.match_valid

    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.normal(size=frames.shape), jnp.bfloat16)
    dt = _time(lambda: step(data), iters)
    return {"metric": "stereo_e2e_triangulation", "value": round(pairs / dt, 1),
            "unit": "stereo pairs/s (forward both views + epipolar match + "
                    "Hartley-Sturm/DLT, batch %d, bf16)" % pairs,
            "host_parity_mm": round(max_dev * 1000, 4)}


def bench_saccade(iters):
    """Config 7: CornerNet_Saccade two-stage inference — downsized attention
    pass -> location decode+NMS -> batched on-device zoom crops (the
    device_crops default) -> second pass -> per-class merge — the
    reference's cornernet_saccade.py:300-400 drive, random weights."""
    import os

    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.inference.saccade import (
        cornernet_saccade_inference,
        make_saccade_decode_fn,
        make_saccade_decode_fn_fused,
    )
    from object_keypoints_tpu.models.cornernet import cornernet_saccade
    from object_keypoints_tpu.utils.config import DetectionConfig, load_cfg

    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "object_keypoints_tpu", "configs",
        "CornerNet_Saccade.json",
    )
    _, db_cfg = load_cfg(cfg_path)
    config = DetectionConfig(db_cfg)
    model = cornernet_saccade(categories=config["categories"], dtype=jnp.bfloat16)
    dummy = jnp.zeros(
        (1, config["input_size"][0], config["input_size"][1], 3), jnp.bfloat16
    )
    variables = model.init({"params": jax.random.key(0)}, dummy)
    # default: the fused crop+decode program (one upload per image, one
    # dispatch per stage); OKT_SACCADE_FUSED=0 measures the split pipeline
    build = (make_saccade_decode_fn
             if os.environ.get("OKT_SACCADE_FUSED") == "0"
             else make_saccade_decode_fn_fused)
    decode_fn = build(model, variables, config)

    # synthetic scene: textured background + high-contrast boxes so the
    # attention stage has real structure to fire on
    rng = np.random.default_rng(2)
    image = rng.integers(20, 80, size=(480, 640, 3)).astype(np.float32)
    for y, x, s in ((120, 160, 60), (300, 420, 120), (80, 500, 30)):
        image[y : y + s, x : x + s] = rng.uniform(180, 255, size=3)

    run = lambda: cornernet_saccade_inference(config, decode_fn, image)
    boxes = run()  # warm both stage compiles
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    n_boxes = int(sum(len(v) for v in boxes.values()))
    return {"metric": "saccade_two_stage_inference", "value": round(1.0 / dt, 2),
            "unit": "images/s (480x640, two-stage attention drive, "
                    "device crops, bf16)",
            "boxes_out": n_boxes}


def bench_saccade_trained(iters, snapshot="results/saccade_tiny/CornerNet_Saccade_800"):
    """Config 7b: the saccade two-stage drive with TRAINED weights — the
    tiny lifecycle detector (scripts/train_detector.py CornerNet_Saccade
    --tiny on the synthetic COCO rectangles, snapshot tracked in
    results/saccade_tiny) so the stage-2 zoom/decode/soft-NMS tail runs on
    a REAL detection population (boxes_out > 0), unlike the full-size
    random-weight row. Scene: rectangles from the training distribution on
    a 192x256 canvas, so stage-1 views (48/64 px) see them at ~1/4 scale
    and the attention zoom is what makes them detectable — the saccade
    premise."""
    import os

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from object_keypoints_tpu.inference.saccade import (
        cornernet_saccade_inference,
        make_saccade_decode_fn,
        make_saccade_decode_fn_fused,
    )
    from object_keypoints_tpu.models.cornernet import tiny_cornernet
    from object_keypoints_tpu.utils.config import (
        DetectionConfig, load_cfg, tiny_db_overrides,
    )

    snap = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", snapshot))
    if not os.path.isdir(snap):
        return {"metric": "saccade_two_stage_trained", "skipped": True,
                "reason": f"no snapshot at {snapshot}"}
    cfg_path = os.path.join(
        os.path.dirname(__file__), "..", "object_keypoints_tpu", "configs",
        "CornerNet_Saccade.json",
    )
    _, db_cfg = load_cfg(cfg_path)
    config = DetectionConfig(dict(db_cfg, **tiny_db_overrides("CornerNet_Saccade")))
    model = tiny_cornernet("CornerNet_Saccade", categories=config["categories"])
    restored = ocp.PyTreeCheckpointer().restore(snap)
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}
    build = (make_saccade_decode_fn
             if os.environ.get("OKT_SACCADE_FUSED") == "0"
             else make_saccade_decode_fn_fused)
    decode_fn = build(model, variables, config)

    # scene from the training distribution (synthetic.make_synthetic_coco_
    # dataset): dark noisy background, warm/cool filled rectangles — at
    # 4x the training canvas so stage 1 must zoom
    rng = np.random.default_rng(3)
    image = rng.integers(0, 40, size=(192, 256, 3)).astype(np.uint8)
    for (y, x, bh, bw, warm) in ((40, 60, 24, 30, True), (120, 180, 28, 22, False),
                                 (60, 200, 18, 26, True)):
        color = ((int(rng.integers(180, 255)), int(rng.integers(0, 80)),
                  int(rng.integers(0, 80))) if warm else
                 (int(rng.integers(0, 80)), int(rng.integers(0, 80)),
                  int(rng.integers(180, 255))))
        image[y:y + bh, x:x + bw] = color

    run = lambda: cornernet_saccade_inference(config, decode_fn, image)
    boxes = run()  # warm the compiles
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    dt = (time.perf_counter() - t0) / iters
    n_boxes = int(sum(len(v) for v in boxes.values()))
    best = max((float(v[:, 4].max()) for v in boxes.values() if len(v)),
               default=0.0)
    return {"metric": "saccade_two_stage_trained", "value": round(1.0 / dt, 2),
            "unit": "images/s (192x256, trained tiny saccade, device crops)",
            "boxes_out": n_boxes, "best_score": round(best, 3)}


def bench_video_eval(quick):
    """Config 5: full eval path over an encoded synthetic sequence."""
    from object_keypoints_tpu.data.synthetic import write_synthetic_sequence
    from object_keypoints_tpu.evaluation import Sequence, evaluate_sequence
    from object_keypoints_tpu.pipeline import ObjectKeypointPipeline

    n_frames = 8 if quick else 30
    with tempfile.TemporaryDirectory() as tmp:
        seq_dir = pathlib.Path(tmp) / "seq"
        write_synthetic_sequence(str(seq_dir), "config/calibration.yaml", [1, 3],
                                 n_frames=n_frames, seed=5)
        config = {"keypoint_config": [1, 3]}
        sequence = Sequence(str(seq_dir), config)
        pipeline = ObjectKeypointPipeline((64, 64), sequence.keypoints, config)
        # the per-frame host-ragged reference path: run once as the accuracy
        # cross-check (its mean_err must match the batched path's)
        slow_summary = evaluate_sequence(
            sequence, pipeline, ground_truth=True
        ).summary()
        # batched single-program GT decode (evaluation.evaluate_sequence_fast
        # ground_truth=True) — first pass warms the jit cache, the
        # steady-state pass is the metric
        from object_keypoints_tpu.evaluation import evaluate_sequence_fast

        evaluate_sequence_fast(sequence, None, config, ground_truth=True)
        t0 = time.perf_counter()
        results = evaluate_sequence_fast(sequence, None, config,
                                         ground_truth=True)
        dt = time.perf_counter() - t0
        summary = results.summary()
    return {"metric": "video_sequence_eval", "value": round(n_frames / dt, 2),
            "unit": "frames/s (dataset decode + batched GT decode + matching)",
            "mean_err_cm": round(summary.get("mean_cm", float("nan")), 3),
            "mean_err_cm_perframe_path": round(
                slow_summary.get("mean_cm", float("nan")), 3)}


def main():
    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--quick", action="store_true")
    parser.add_argument("--only", default=None,
                        help="Comma-separated config names to run (e.g. "
                        "'saccade,stereo_e2e'); default all seven.")
    flags = parser.parse_args()
    iters = 5 if flags.quick else 20

    configs = (
        ("single_image", lambda: bench_single_image_inference(iters)),
        ("stereo_triangulation", lambda: bench_stereo_triangulation(iters)),
        ("overfit", lambda: bench_overfit(3 if flags.quick else 10)),
        ("cups_association", lambda: bench_cups_association(iters)),
        ("video_eval", lambda: bench_video_eval(flags.quick)),
        ("stereo_e2e", lambda: bench_stereo_e2e(iters, pairs=4 if flags.quick else 16)),
        ("saccade", lambda: bench_saccade(2 if flags.quick else 10)),
        ("saccade_trained",
         lambda: bench_saccade_trained(2 if flags.quick else 10)),
    )
    only = set(flags.only.split(",")) if flags.only else None
    if only is not None:
        known = {name for name, _ in configs}
        unknown = only - known
        if unknown:
            raise SystemExit(
                f"--only: unknown config name(s) {sorted(unknown)}; "
                f"valid names: {sorted(known)}"
            )
    failed = False
    for name, fn in configs:
        if only is not None and name not in only:
            continue
        # one config failing must not eat the remaining measurements
        try:
            print(json.dumps(fn()), flush=True)
        except Exception as e:  # noqa: BLE001
            failed = True
            print(json.dumps({"metric": name, "error": repr(e)[:500]}),
                  flush=True)
    if failed:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
