#!/usr/bin/env python
"""Full-model int8 serve latency under different quantization skip sets.

benchmarks/segment_profile.py (round 3) measured the hourglass segment
PESSIMIZING under int8 (0.93x: 9.65 ms int8 vs 8.96 bf16 @96 frames) while
the stem and cnv win. The interceptor (serving/quantize.py) already takes a
``skip`` predicate, so probe the e2e forward with several skip sets to find
the best int8/bf16 placement. Prints one JSON line per variant.

Usage: python benchmarks/quant_skip_sweep.py   (env: OKT_BENCH_PAIRS)

MEASURED (round 3, @96 frames):
    bf16                         51.54 ms   1863 frames/s
    int8_all                     38.99 ms   2462
    int8_skip_hg                 38.39 ms   2501   <- best; now the default
    int8_skip_hg_heads           39.09 ms   2456   (head quant helps; keep)
    int8_stem_only               43.99 ms   2183
    int8_no_hg_no_heads_no_inter 40.93 ms   2346
Adopted as serving/quantize.py DEFAULT_SKIP_SUBSTRINGS = ("/hg_",).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from benchmarks._timing import time_fn

import numpy as np

PAIRS = int(os.environ.get("OKT_BENCH_PAIRS", "48"))
ITERS = 20
WARMUP = 3




def main():
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.models import KeypointNet
    from object_keypoints_tpu.serving.quantize import (
        calibrate_activation_scales,
        quantized_apply,
    )
    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B = 2 * PAIRS
    model = KeypointNet(heatmaps_out=3, dtype=jnp.bfloat16)
    variables = model.init(
        {"params": jax.random.key(0)}, jnp.zeros((1, 511, 511, 3), jnp.bfloat16),
        train=False,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(B, 511, 511, 3)), jnp.bfloat16)
    scales = calibrate_activation_scales(
        lambda b: model.apply(variables, b, train=False), [x[:8]]
    )

    # module paths look like backbone/hg_0/up1_0/..., backbone/pre_res1,
    # backbone/cnv_0, heatmap_head_0/conv0 (models/hourglass.py names)
    variants = [
        ("bf16", None, False),
        # skip=None would now apply the measured default placement
        # (quantize.default_skip); pin "quantize everything" explicitly
        ("int8_all", lambda p: False, True),
        # keep the hourglass stacks bf16 (fire modules, up2, low-res
        # residuals) — segment-profiled as an int8 LOSS (0.93x)
        ("int8_skip_hg", lambda p: "/hg_" in p, True),
        # keep hourglass AND head prediction modules bf16
        ("int8_skip_hg_heads",
         lambda p: "/hg_" in p or "_head_" in p, True),
        # int8 only on the stem residuals (the biggest int8 win per
        # segment_profile); everything else bf16
        ("int8_stem_only", lambda p: "pre_res" not in p, True),
        # stem + cnv/merge/inter blocks int8, hourglass + heads bf16
        ("int8_no_hg_no_heads_no_inter",
         lambda p: "/hg_" in p or "_head_" in p or "inter_res" in p, True),
    ]
    for name, skip, quant in variants:
        if quant:
            fn = jax.jit(lambda a, s=skip: quantized_apply(
                model, variables, scales, a, train=False, skip=s))
        else:
            fn = jax.jit(lambda a: model.apply(variables, a, train=False))
        try:
            dt = time_fn(fn, x, warmup=WARMUP, iters=ITERS)
        except Exception as e:  # a variant that fails to lower still reports
            print(json.dumps({"variant": name, "error": str(e)[:200]}),
                  flush=True)
            continue
        print(json.dumps({
            "variant": name, "batch": B, "ms": round(dt * 1000, 3),
            "frames_per_s": round(B / dt, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
