#!/usr/bin/env python
"""Per-segment timing of the serve forward at bench shapes (bf16 vs int8).

Budget tool for the int8 efficiency work (round-3): times each backbone
segment as its own jitted program at the exact shapes the e2e bench runs
(OKT_BENCH_PAIRS pairs -> 2*PAIRS frames), both bf16 and int8-PTQ, plus
the full forward and the decode tail, and prints achieved TFLOP/s (or
TOP/s) from XLA's own cost analysis next to the chip peaks so the gap per
segment is explicit.

Segments mirror models/hourglass.py::HourglassStack:
  conv7 (pre_conv 7x7/s2 3->128 @511) -> res1 (/s2 128->256 @256)
  -> res2 (/s2 256->256 @128) -> hg (FireHourglass @64) -> cnv (3x3 256)
  -> heads (3x PredictionModule).

Usage: python benchmarks/segment_profile.py  (one JSON line per row)

MEASURED (round 3, @96 frames, int8 = quantize-everything placement):
    conv7:      bf16 10.01 ms (18.9%)  int8 10.02 ms (10.9%)  0.998x
    res1:       bf16 22.02 ms (103%)   int8 19.37 ms (67.9%)  1.14x
    res2:       bf16  8.17 ms (93.9%)  int8  7.48 ms (59.3%)  1.09x
    hg:         bf16  8.96 ms (43.8%)  int8  9.65 ms (23.5%)  0.93x  <- LOSS
    cnv:        bf16  4.77 ms (75.6%)  int8  4.00 ms (52.1%)  1.19x
    full_model: bf16 51.66 ms (110%)   int8 38.25 ms (85.9%)  1.35x
Segment sum (int8) is 50.6 ms vs 38.2 full-model: XLA's cross-segment
fusion already stores stem intermediates int8, so per-segment rows
OVERSTATE isolated cost. conv7 is output-bandwidth-bound (1.6 GB bf16 map
@96 = ~8 ms at 205 GB/s), not MXU-bound; the hg interior loses under int8
(tiny spatial extents, f32 skip-add boundaries) — which is why serving's
default placement now skips "/hg_" (serving/quantize.py
DEFAULT_SKIP_SUBSTRINGS, benchmarks/quant_skip_sweep.py).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from benchmarks._timing import time_fn

import numpy as np

PAIRS = int(os.environ.get("OKT_BENCH_PAIRS", "48"))
ITERS = int(os.environ.get("OKT_PROF_ITERS", "20"))
WARMUP = 3

# chip peaks measured round 2 (CLAUDE.md): bf16 126 TFLOP/s, int8 218 TOP/s
PEAK = {"bf16": 126e12, "int8": 218e12}




def _flops(f, x):
    import jax

    try:
        c = jax.jit(f).lower(x).compile().cost_analysis()
        if isinstance(c, list):
            c = c[0]
        return float(c.get("flops", float("nan")))
    except Exception:
        return float("nan")


def main():
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.models.blocks import ConvBlock, Residual
    from object_keypoints_tpu.models.hourglass import FireHourglass
    from object_keypoints_tpu.models.keypoint_net import KeypointNet
    from object_keypoints_tpu.serving.quantize import (
        calibrate_activation_scales,
        quantized_apply,
    )
    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B = 2 * PAIRS
    bf16 = jnp.bfloat16
    segs = [
        ("conv7", ConvBlock(128, kernel=7, stride=2, dtype=bf16), (B, 511, 511, 3)),
        ("res1", Residual(256, stride=2, dtype=bf16), (B, 256, 256, 128)),
        ("res2", Residual(256, stride=2, dtype=bf16), (B, 128, 128, 256)),
        ("hg", FireHourglass(4, (256, 256, 384, 384, 512), (2, 2, 2, 2, 4),
                             dtype=bf16), (B, 64, 64, 256)),
        ("cnv", ConvBlock(256, kernel=3, dtype=bf16), (B, 64, 64, 256)),
        ("full_model", KeypointNet(heatmaps_out=3, dtype=bf16), (B, 511, 511, 3)),
    ]
    rng = np.random.default_rng(0)
    for name, mod, shape in segs:
        x = jnp.asarray(rng.normal(size=shape), bf16)
        variables = mod.init({"params": jax.random.key(0)}, x[:1], train=False)
        row = {"segment": name, "batch": shape[0], "in": shape[1:]}
        for quant in (False, True):
            if quant:
                scales = calibrate_activation_scales(
                    lambda b: mod.apply(variables, b, train=False), [x[:4]]
                )
                # skip=lambda p: False pins raw int8-everywhere so the
                # per-segment numbers stay comparable across rounds even
                # though serving's default placement now skips the hg
                fn = jax.jit(
                    lambda a: quantized_apply(mod, variables, scales, a,
                                              train=False, skip=lambda p: False)
                )
            else:
                fn = jax.jit(lambda a: mod.apply(variables, a, train=False))
            dt = time_fn(fn, x, warmup=WARMUP, iters=ITERS)
            flops = _flops(lambda a: mod.apply(variables, a, train=False), x)
            key = "int8" if quant else "bf16"
            row[f"{key}_ms"] = round(dt * 1000, 3)
            if np.isfinite(flops):
                row[f"{key}_eff_pct"] = round(
                    100 * flops / dt / PEAK[key], 1
                )
        row["speedup"] = round(row["bf16_ms"] / row["int8_ms"], 3)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
