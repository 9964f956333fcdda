"""Fused stem convolution: space-to-depth 7x7/s2 conv + BN + ReLU.

Why: the first stem layer (ConvBlock(128, k=7, s=2) on a 511/512^2 RGB
frame, CornerNet_Squeeze.py:66-72) is the single most expensive op in the
serve path — XLA lowers the 3-channel strided conv ~3x off this chip's
memory roofline. The kernel:

  1. host/XLA side: pad the frame to 512 and space-to-depth by 2 ->
     (N, 256, 256, 12); rearrange the (7,7,3,128) kernel once into a
     (4*4*12, 128) tap matrix;
  2. Pallas: per (batch, row-strip) grid cell, keep the whole padded s2d
     image for the batch element in VMEM (3.2 MB), slice the strip plus its
     (2 up / 1 down) halo, concatenate the 16 unit-stride tap shifts into a
     192-channel tensor, and run ONE (192 -> 128) MXU matmul, then apply
     folded BN scale/bias + ReLU and write the strip.

Tap decomposition: out(y, x) = sum_{dy,dx<7} W[dy,dx] . img(2y+dy-3,
2x+dx-3); with dy = 2u + p + 3 (u in [-2,1], p the s2d row slot) every
sample is the s2d cell (y+u, x+v) slot (p, q) — a 4x4 unit-stride
neighborhood, so the strided 7x7 becomes 16 shifted matmul taps.

Numerics validated against jax.lax.conv in tests/test_pallas.py (interpret
mode on CPU); perf measured on the real chip in bench notes.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def space_to_depth(x):
    """(N, H, W, C) -> (N, H/2, W/2, 4C); slot order (row parity, col
    parity) row-major."""
    n, h, w, c = x.shape
    y = x.reshape(n, h // 2, 2, w // 2, 2, c)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(n, h // 2, w // 2, 4 * c)


def rearrange_stem_kernel(w7: np.ndarray) -> np.ndarray:
    """(7, 7, C_in, C_out) conv kernel -> (4, 4 * 4*C_in, C_out) v-grouped
    tap matrices.

    For each width shift v, the 4 row-shift taps u are stacked u-major along
    K, each contributing the 4*C_in s2d channels (slot-major: slot = 2p + q,
    then C_in) — matching the kernel's per-v lane concatenation."""
    w7 = np.asarray(w7)
    assert w7.shape[:2] == (7, 7)
    c_in, c_out = w7.shape[2], w7.shape[3]
    taps = np.zeros((4, 4, 4 * c_in, c_out), w7.dtype)
    for u in range(-2, 2):
        for v in range(-2, 2):
            for p in range(2):
                for q in range(2):
                    dy = 2 * u + p + 3
                    dx = 2 * v + q + 3
                    if 0 <= dy < 7 and 0 <= dx < 7:
                        slot = 2 * p + q
                        taps[u + 2, v + 2, slot * c_in : (slot + 1) * c_in] = w7[dy, dx]
    # group by width-shift v: out[v] stacks the 4 row-shift taps u-major,
    # matching the kernel's per-v lane concatenation
    s2d_c = 4 * c_in
    grouped = np.zeros((4, 4 * s2d_c, c_out), w7.dtype)
    for v in range(4):
        for u in range(4):
            grouped[v, u * s2d_c : (u + 1) * s2d_c] = taps[u, v]
    return grouped


def _stem_kernel(x_ref, w_ref, scale_ref, bias_ref, out_ref, *,
                 rows: int, width: int, c_in: int, c_out: int):
    """Grid cell (batch i, strip j): 16 tap-shifted matmuls + BN + ReLU.

    x_ref: (1, 1, rows+3, WP, c_in) pre-haloed strip; out_ref:
    (1, rows, width, c_out)."""
    strip = x_ref[0, 0]
    # Mosaic vreg layouts: width lives in sublanes, channels in lanes. A
    # lane-concat needs equal sublane offsets, so taps are grouped by the
    # width shift v (equal offsets within a group) -> 4 dots of K = 4*c_in
    # instead of 16 MXU-starved K=c_in dots.
    acc = jnp.zeros((rows, width, c_out), jnp.float32)
    for v in range(4):
        col = jnp.concatenate(
            [strip[u : u + rows, v : v + width, :] for u in range(4)], axis=-1
        )  # (rows, width, 4 * c_in)
        acc += jax.lax.dot_general(
            col, w_ref[v],
            dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    acc = acc * scale_ref[0][None, None, :] + bias_ref[0][None, None, :]
    out_ref[0] = jnp.maximum(acc, 0.0).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("rows_per_strip", "interpret"))
def fused_stem_conv(x_s2d, w_taps, scale, bias, rows_per_strip: int = 16,
                    interpret: bool = False):
    """s2d input (N, H, W, 12) -> (N, H, W, 128) fused conv + BN + ReLU.

    w_taps: (4, 48, 128) v-grouped from rearrange_stem_kernel; scale/bias:
    (128,) folded batch-norm parameters.

    The halo'd strips are materialized once in XLA (a cheap gather on the
    tiny 12-channel input) so the Pallas grid sees plain non-overlapping
    blocks."""
    n, h, w, c_in = x_s2d.shape
    c_out = w_taps.shape[-1]
    assert h % rows_per_strip == 0, (h, rows_per_strip)
    rows = rows_per_strip
    strips = h // rows

    wp = -(-(w + 3) // 8) * 8
    xp = jnp.pad(x_s2d, ((0, 0), (2, 1), (2, wp - w - 2), (0, 0)))
    # (N, strips, rows+3, WP, c_in) haloed strips
    xh = jnp.stack([xp[:, k * rows : k * rows + rows + 3] for k in range(strips)], axis=1)
    w3 = w_taps  # (4, 4*c_in, c_out), v-grouped

    kernel = functools.partial(
        _stem_kernel, rows=rows, width=w, c_in=c_in, c_out=c_out
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n, h, w, c_out), x_s2d.dtype),
        grid=(n, strips),
        in_specs=[
            pl.BlockSpec(
                (1, 1, rows + 3, wp, c_in), lambda i, j: (i, j, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (4, 4 * c_in, c_out), lambda i, j: (0, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, rows, w, c_out), lambda i, j: (i, j, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(xh, w3, scale[None], bias[None])


def stem_conv_reference(x, w7, scale, bias):
    """XLA reference: 7x7/s2 conv + scale/bias + relu on the raw frame
    (NHWC, pad 3)."""
    y = jax.lax.conv_general_dilated(
        x, w7, (2, 2), [(3, 3), (3, 3)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return jnp.maximum(y * scale + bias, 0.0).astype(x.dtype)


def stem_conv_pallas_from_frame(frames, w7, scale, bias, rows_per_strip=16):
    """Raw frames (N, 512, 512, 3) -> (N, 256, 256, 128) via the fused
    kernel (s2d + tap rearrangement included). Frames of odd size 511 are
    zero-padded to 512 on the bottom/right — identical to the torch
    conv arithmetic for every output pixel except the final row/col's
    out-of-image taps, which see zeros either way."""
    n, h, w, _ = frames.shape
    if h % 2 or w % 2:
        frames = jnp.pad(frames, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
    x = space_to_depth(frames)
    taps = jnp.asarray(rearrange_stem_kernel(np.asarray(w7, np.float32))).astype(frames.dtype)
    return fused_stem_conv(x, taps, scale, bias, rows_per_strip=rows_per_strip)
