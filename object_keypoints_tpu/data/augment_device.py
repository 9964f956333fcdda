"""Device-side stochastic augmentation — the jitted analog of
AugmentationPipeline.photometric (data/augment.py).

TPU-first motivation: on a tunneled accelerator the per-step host work +
frame upload dominates the wall step (measured 871 ms wall vs 67 ms device
step at flagship geometry, benchmarks/train_e2e.py). Moving the stochastic
suffix (photometric + cutout + flips) INTO the jitted train step lets the
whole dataset live device-resident (training/device_data.py) and each step
ship only indices + a PRNG key.

Parity with the host pipeline (albumentations semantics, reference
perception/datasets/video.py:85-100):

- brightness/contrast then gamma reproduce the host's composed uint8 LUTs
  bit-for-bit up to float rounding: the LUTs floor() at each uint8 stage,
  so the device math applies the same two floors
  (tests/test_data.py gates max|device - LUT| <= 1).
- Cutout: 8 holes, 25x25 (12 px each side of an integer center drawn
  uniformly over the image), fill 0 — identical geometry.
- H/V flips mirror the image and remap keypoints with the same
  (size-1) - x convention.
- CLAHE (p=0.1 on the host path) is SKIPPED here: adaptive histogram
  equalization is host-bound cv2; the deviation is documented in
  PARITY.md and the host path stays the exact-parity default.

All draws use distinct jax PRNG streams; distributions match the host's
(U(-0.2,0.2) brightness/contrast, gamma U(0.8,1.2), p=0.5 cutout/flips).
The host and device paths consume different RNG streams by construction —
they are the same *distribution*, not the same sample sequence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def apply_bcg(frame_f32, alpha, beta, gamma):
    """Brightness/contrast then gamma on a [0,255] float frame with the
    host LUTs' double-floor uint8 quantization (pure; params explicit)."""
    x = jnp.floor(jnp.clip(frame_f32 * alpha + beta * 255.0, 0.0, 255.0))
    return jnp.floor((x / 255.0) ** gamma * 255.0)


def brightness_contrast_gamma(frame_f32, key,
                              brightness_limit: float = 0.2,
                              contrast_limit: float = 0.2,
                              gamma_limit=(0.8, 1.2)):
    """Draw (alpha, beta, gamma) like the host pipeline and apply."""
    ka, kb, kg = jax.random.split(key, 3)
    alpha = 1.0 + jax.random.uniform(ka, (), minval=-contrast_limit,
                                     maxval=contrast_limit)
    beta = jax.random.uniform(kb, (), minval=-brightness_limit,
                              maxval=brightness_limit)
    gamma = jax.random.uniform(kg, (), minval=gamma_limit[0],
                               maxval=gamma_limit[1])
    return apply_bcg(frame_f32, alpha, beta, gamma)


def cutout(frame_f32, key, num_holes: int = 8, max_h: int = 25,
           max_w: int = 25):
    """albumentations Cutout (video.py:93): zero `num_holes` windows of
    max_h x max_w around uniformly-drawn integer centers."""
    h, w = frame_f32.shape[:2]
    ky, kx = jax.random.split(key)
    cy = jax.random.randint(ky, (num_holes,), 0, h)
    cx = jax.random.randint(kx, (num_holes,), 0, w)
    yy = jnp.arange(h)[:, None, None]  # (h, 1, 1)
    xx = jnp.arange(w)[None, :, None]  # (1, w, 1)
    hole = ((yy >= cy - max_h // 2) & (yy < cy + max_h // 2)
            & (xx >= cx - max_w // 2) & (xx < cx + max_w // 2))  # (h, w, holes)
    return jnp.where(hole.any(axis=-1)[..., None], 0.0, frame_f32)


def flip_device(frame, keypoints, do_h, do_v):
    """Mirror the frame and remap (x, y) keypoints with the host's
    (size-1) - coord convention (pure; booleans explicit)."""
    h, w = frame.shape[:2]
    frame = jnp.where(do_h, frame[:, ::-1], frame)
    frame = jnp.where(do_v, frame[::-1], frame)
    x = jnp.where(do_h, (w - 1) - keypoints[..., 0], keypoints[..., 0])
    y = jnp.where(do_v, (h - 1) - keypoints[..., 1], keypoints[..., 1])
    return frame, jnp.stack([x, y], axis=-1)


def photometric_device(frame_u8, keypoints, key):
    """One example's stochastic suffix: bc/gamma -> (CLAHE skipped) ->
    cutout(p=.5) -> hflip(p=.5) -> vflip(p=.5).

    frame_u8: (H, W, 3) uint8; keypoints: (P, 2) image-space (x, y).
    Returns ([0,255] f32 frame, transformed keypoints). jit/vmap-able.
    """
    k_bcg, k_docut, k_cut, k_doh, k_dov = jax.random.split(key, 5)
    frame = brightness_contrast_gamma(frame_u8.astype(jnp.float32), k_bcg)
    frame = jnp.where(jax.random.uniform(k_docut) < 0.5,
                      cutout(frame, k_cut), frame)
    do_h = jax.random.uniform(k_doh) < 0.5
    do_v = jax.random.uniform(k_dov) < 0.5
    return flip_device(frame, keypoints, do_h, do_v)
