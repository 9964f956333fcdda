"""Corner pooling: directional running-max ops.

The reference implements these as 4 C++ ATen extensions
(corner_net_lite/core/models/py_utils/_cpools/*.cpp): the forward is an
in-place doubling-stride scan — a log-depth cumulative max along one image
axis (top_pool.cpp:16-21) — and the backward scatter-adds gradients to the
running argmax (top_pool.cpp:28-69).

On TPU no custom kernel is needed: a directional cummax is
``jax.lax.cummax`` (reversed for the suffix variants), XLA fuses the
two-pool + add block, and JAX autodiff yields exactly the
scatter-to-argmax backward.

Direction map (torch NCHW semantics -> our NHWC):
- TopPool:    out[i] = max(x[i:])   along H  -> suffix cummax, axis 1
- BottomPool: out[i] = max(x[:i+1]) along H  -> prefix cummax, axis 1
- LeftPool:   out[j] = max(x[j:])   along W  -> suffix cummax, axis 2
- RightPool:  out[j] = max(x[:j+1]) along W  -> prefix cummax, axis 2
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _axis(x, spatial_axis: int) -> int:
    """spatial_axis: 0 = H, 1 = W for NHWC (..., H, W, C) tensors."""
    return x.ndim - 3 + spatial_axis


def top_pool(x):
    """Suffix max along H (max over this row and everything below)."""
    return lax.cummax(x, axis=_axis(x, 0), reverse=True)


def bottom_pool(x):
    """Prefix max along H."""
    return lax.cummax(x, axis=_axis(x, 0))


def left_pool(x):
    """Suffix max along W."""
    return lax.cummax(x, axis=_axis(x, 1), reverse=True)


def right_pool(x):
    """Prefix max along W."""
    return lax.cummax(x, axis=_axis(x, 1))


# Object aliases mirroring the reference's nn.Module exports
# (_cpools/__init__.py:60-74).
class _PoolModule:
    def __init__(self, fn):
        self._fn = fn

    def __call__(self, x):
        return self._fn(jnp.asarray(x))


TopPool = lambda: _PoolModule(top_pool)  # noqa: E731
BottomPool = lambda: _PoolModule(bottom_pool)  # noqa: E731
LeftPool = lambda: _PoolModule(left_pool)  # noqa: E731
RightPool = lambda: _PoolModule(right_pool)  # noqa: E731
