"""Heatmap decoding on device: box filter, max-pool NMS, sub-pixel peaks.

TPU-first rebuild of the reference KeypointExtractionComponent
(perception/pipeline.py:30-91) which runs a 5x5 ones conv + torch max-pool
NMS, then *Python-loops over every surviving pixel* to compute a 5x5
probability-weighted centroid. Here the whole decode is one jitted program
with static capacities:

    probs (C,H,W) -> box_filter -> maxpool_nms -> top-K peaks/channel
    -> gathered 5x5 windows -> weighted centroid + confidence, all vmapped.

Semantics parity notes (gated by tests/test_pipeline.py):
- the reference threshold (> 0.5) is applied to the NMS-suppressed *box
  filtered* map (pipeline.py:72-74); confidence equals the window sum of raw
  probabilities, which is exactly the box-filter response at the peak;
- window clipping at image borders equals zero-padding, since pixels outside
  contribute zero probability mass;
- returned points are (x, y), matching the reference's axis flip
  (pipeline.py:77).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def box_filter(x, size: int = 5):
    """Sum over a size x size window, zero padding (torch conv2d with a ones
    kernel and padding=size//2; reference pipeline.py:39,70)."""
    pad = size // 2
    return jax.lax.reduce_window(
        x,
        0.0,
        jax.lax.add,
        window_dimensions=(1,) * (x.ndim - 2) + (size, size),
        window_strides=(1,) * x.ndim,
        padding=((0, 0),) * (x.ndim - 2) + ((pad, pad), (pad, pad)),
    )


def maxpool_nms(x, size: int = 5):
    """Keep only pixels equal to their size x size neighborhood max.

    Reference perception/models.py:55-58 (torch max_pool2d pads with -inf,
    so border maxima survive — reduce_window with -inf init matches).
    """
    pad = size // 2
    hmax = jax.lax.reduce_window(
        x,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1,) * (x.ndim - 2) + (size, size),
        window_strides=(1,) * x.ndim,
        padding=((0, 0),) * (x.ndim - 2) + ((pad, pad), (pad, pad)),
    )
    return jnp.where(x == hmax, x, jnp.zeros_like(x))


def _channel_peaks(probs, max_peaks: int, threshold: float, window: int):
    """Peaks of one (H, W) probability map.

    Returns (points_xy (K,2), confidence (K,), valid (K,)) with K=max_peaks.
    """
    h, w = probs.shape
    filtered = box_filter(probs[None, None], size=window)[0, 0]
    suppressed = maxpool_nms(filtered[None, None], size=window)[0, 0]

    flat = suppressed.reshape(-1)
    scores, idx = jax.lax.top_k(flat, max_peaks)
    valid = scores > threshold
    py = idx // w
    px = idx % w

    # 5x5 windows from the zero-padded raw probability map.
    pad = window // 2
    padded = jnp.pad(probs, pad)
    di = jnp.arange(window)
    # (K, window, window) gather indices into the padded map
    yy = py[:, None, None] + di[None, :, None]
    xx = px[:, None, None] + di[None, None, :]
    win = padded[yy, xx]  # (K, 5, 5)

    mass = jnp.sum(win, axis=(1, 2))
    # centroid over *unpadded* coordinates: padded index - pad + original
    iy = (py[:, None, None] - pad + di[None, :, None]).astype(probs.dtype)
    ix = (px[:, None, None] - pad + di[None, None, :]).astype(probs.dtype)
    safe = jnp.maximum(mass, 1e-12)
    cy = jnp.sum(win * iy, axis=(1, 2)) / safe
    cx = jnp.sum(win * ix, axis=(1, 2)) / safe

    points = jnp.stack([cx, cy], axis=-1)  # (x, y) like pipeline.py:77
    return points, mass, valid


@functools.partial(jax.jit, static_argnames=("max_peaks", "threshold", "window"))
def extract_peaks(probs, max_peaks: int = 32, threshold: float = 0.5, window: int = 5):
    """Decode every channel of a probability map stack.

    probs: (C, H, W) -> points (C, K, 2) in (x, y), confidence (C, K),
    valid (C, K). Batched callers vmap over the leading axis.
    """
    return jax.vmap(lambda p: _channel_peaks(p, max_peaks, threshold, window))(probs)


@functools.partial(jax.jit, static_argnames=("max_peaks", "threshold", "window"))
def extract_peaks_batch(probs, max_peaks: int = 32, threshold: float = 0.5, window: int = 5):
    """(N, C, H, W) batched variant of :func:`extract_peaks`."""
    return jax.vmap(
        lambda frame: jax.vmap(lambda p: _channel_peaks(p, max_peaks, threshold, window))(frame)
    )(probs)
