#!/usr/bin/env python
"""Stride-2 / 3x3 int8 convs as parity-plane dot accumulations vs XLA convs.

Round-2 measured XLA's int8 conv lowering at ~65% of the chip's int8 peak
on the stem residual blocks (res1: 6.8 ms vs a 4.4 ms floor @32 frames),
and closed the Pallas-conv avenue (Mosaic rejects strided sublane slices;
tap-concat relayouts dominate). This probes the remaining idea at the XLA
level, where strided slices are free:

- conv1 (3x3 stride-2): space-to-depth the input into its four parity
  planes, then FOUR accumulated int8 dot_generals whose contraction dims
  exactly partition the 9 taps with no zero padding:
    offset (i , j ): taps {1,2}x{1,2} -> all 4 planes, contraction 4C
    offset (i-1,j ): taps {0}x{1,2}   -> row-parity-1 planes,    2C
    offset (i , j-1): taps {1,2}x{0}  -> col-parity-1 planes,    2C
    offset (i-1,j-1): tap  {0}x{0}    -> plane (1,1),             C
  (4C + 2C + 2C + C = 9C = the conv's true MAC count.)
- conv2 (3x3 stride-1): nine shifted-slice int8 dots of contraction C,
  accumulated in int32 (no im2col materialization).
- skip (1x1 stride-2): a single plane-slice dot.

If these beat nn.Conv's int8 lowering, the serving interceptor can rewrite
eligible convs the same way; either way the numbers go in the round-3
notes. Prints one JSON line per variant.

MEASURED (round 3, @96 frames, exact=true both cases, reproduced twice):
    res1_conv1_s2: XLA conv 10.5 ms (88 TOP/s) vs parity dots 32.7 ms -> 0.32x
    res2_conv1_s2: XLA conv  6.4 ms (73 TOP/s) vs parity dots 11.9 ms -> 0.53x
The parity-plane dot form LOSES 2-3x at the XLA level too: the shifted
plane concats materialize (B,h,w,9C/4) int8 operands in HBM, and that
traffic dwarfs the MXU win — the same verdict as the round-2 Pallas
variants (tap-concat relayouts). Together with the Mosaic strided-slice
rejection, every "conv as explicit dots" avenue for the stem is now closed
with numbers; XLA's own int8 conv lowering (~65-88 TOP/s, 30-40% of the
218 TOP/s peak) stands. Remaining headroom is HBM-bandwidth- not
MXU-bound (conv7 writes a 1.6 GB bf16 map @96: ~8 ms of pure traffic).

Usage: python benchmarks/int8_parity_form.py  (env: OKT_BENCH_PAIRS)
"""

import json
import os
import pathlib
import sys
from functools import partial

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from benchmarks._timing import time_fn

import numpy as np

PAIRS = int(os.environ.get("OKT_BENCH_PAIRS", "48"))
ITERS = 20
WARMUP = 3




def _q8(x, scale):
    import jax.numpy as jnp

    return jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)


def conv_ref_int8(x8, k8):
    """XLA's own int8 conv lowering (what serving/quantize.py emits)."""
    import jax.lax as lax

    return lax.conv_general_dilated(
        x8, k8, window_strides=(2, 2), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=np.int32,
    )


def conv_parity_form(x8, k8):
    """3x3 stride-2 as four parity-plane dot accumulations (see module doc).

    x8: (B, H, W, C) int8, H and W even; k8: (3, 3, C, F) int8.
    Returns (B, H//2, W//2, F) int32, identical to conv_ref_int8.
    """
    import jax.numpy as jnp

    B, H, W, C = x8.shape
    F = k8.shape[-1]
    h, w = H // 2, W // 2

    # parity planes: P[r][c][b, i, j, :] = x[b, 2i+r, 2j+c, :]
    P = [[x8[:, r::2, c::2, :] for c in (0, 1)] for r in (0, 1)]

    def shift_down(p):  # block row i-1 (top zero row)
        return jnp.pad(p, ((0, 0), (1, 0), (0, 0), (0, 0)))[:, :h]

    def shift_right(p):  # block col j-1
        return jnp.pad(p, ((0, 0), (0, 0), (1, 0), (0, 0)))[:, :, :w]

    # tap (ki, kj) reads input row 2i+ki-1, col 2j+kj-1:
    #   ki=1 -> P[0] at block row i;  ki=2 -> P[1] at i;  ki=0 -> P[1] at i-1
    def dot(act, taps):
        k = jnp.concatenate([k8[ki, kj] for ki, kj in taps], axis=0)
        return jnp.einsum(
            "bijc,cf->bijf", act, k, preferred_element_type=jnp.int32
        )

    # offset (i, j): taps (1,1),(2,1),(1,2),(2,2) over planes 00,10,01,11
    a = jnp.concatenate([P[0][0], P[1][0], P[0][1], P[1][1]], axis=-1)
    out = dot(a, [(1, 1), (2, 1), (1, 2), (2, 2)])
    # offset (i-1, j): taps (0,1),(0,2) over planes 10,11 shifted down
    b = jnp.concatenate([shift_down(P[1][0]), shift_down(P[1][1])], axis=-1)
    out += dot(b, [(0, 1), (0, 2)])
    # offset (i, j-1): taps (1,0),(2,0) over planes 01,11 shifted right
    c = jnp.concatenate([shift_right(P[0][1]), shift_right(P[1][1])], axis=-1)
    out += dot(c, [(1, 0), (2, 0)])
    # offset (i-1, j-1): tap (0,0) over plane 11 shifted both
    d = shift_down(shift_right(P[1][1]))
    out += dot(d, [(0, 0)])
    return out


def conv_s1_ref_int8(x8, k8):
    import jax.lax as lax

    return lax.conv_general_dilated(
        x8, k8, window_strides=(1, 1), padding=[(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=np.int32,
    )


def conv_s1_tap_dots(x8, k8):
    """3x3 stride-1 as nine shifted-slice dots accumulated in int32."""
    import jax.numpy as jnp

    B, H, W, C = x8.shape
    xp = jnp.pad(x8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for ki in range(3):
        for kj in range(3):
            tap = xp[:, ki : ki + H, kj : kj + W, :]
            y = jnp.einsum(
                "bijc,cf->bijf", tap, k8[ki, kj],
                preferred_element_type=jnp.int32,
            )
            out = y if out is None else out + y
    return out


def main():
    import jax
    import jax.numpy as jnp

    from object_keypoints_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B = 2 * PAIRS
    rng = np.random.default_rng(0)

    cases = [
        # (name, shape, Cout, stride) — the stem's two hot residual convs
        ("res1_conv1_s2", (B, 256, 256, 128), 256, 2),
        ("res2_conv1_s2", (B, 128, 128, 256), 256, 2),
        ("res1_conv2_s1", (B, 128, 128, 256), 256, 1),
        ("res2_conv2_s1", (B, 64, 64, 256), 256, 1),
    ]
    for name, shape, cout, stride in cases:
        x = rng.normal(size=shape).astype(np.float32)
        k = rng.normal(size=(3, 3, shape[-1], cout)).astype(np.float32) * 0.05
        x8 = jnp.asarray(np.clip(np.round(x / 0.05), -127, 127), jnp.int8)
        k8 = jnp.asarray(np.clip(np.round(k / 0.005), -127, 127), jnp.int8)

        if stride == 2:
            ref = jax.jit(conv_ref_int8)
            alt = jax.jit(conv_parity_form)
        else:
            ref = jax.jit(conv_s1_ref_int8)
            alt = jax.jit(conv_s1_tap_dots)

        r = np.asarray(ref(x8, k8))
        a = np.asarray(alt(x8, k8))
        exact = bool((r == a).all())
        t_ref = time_fn(ref, x8, k8, warmup=WARMUP, iters=ITERS)
        t_alt = time_fn(alt, x8, k8, warmup=WARMUP, iters=ITERS)
        macs = r.size // B * 9 * shape[-1] * B
        print(json.dumps({
            "case": name, "batch": B, "exact": exact,
            "xla_conv_ms": round(t_ref * 1000, 3),
            "parity_dots_ms": round(t_alt * 1000, 3),
            "speedup": round(t_ref / t_alt, 3),
            "xla_top_s": round(2 * macs / t_ref / 1e12, 1),
            "alt_top_s": round(2 * macs / t_alt / 1e12, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
