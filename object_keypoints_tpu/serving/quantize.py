"""Post-training int8 quantization for the serving path.

The reference serves a TorchScript fp16/fp32 trace (scripts/package_model.py:35-42);
it has no quantized path. This is a TPU-native extra: v5e-class chips run
int8 MXU contractions ~1.4-1.7x faster than bf16 (measured on this chip:
218 TOP/s int8 vs 131 TFLOP/s bf16 on 8192^3; 1.36x on the hot 3x3 convs),
and int8 activations halve HBM traffic on the memory-bound stem.

Design: a Flax *method interceptor* (``nn.intercept_methods``) swaps every
eligible ``nn.Conv`` for

    x_int8 = clip(round(x / s_act), -127, 127)
    y_int32 = conv(x_int8, round(kernel / s_w))        # int8 x int8 -> int32 MXU
    y = y_int32 * (s_act * s_w[out_ch]) (+ bias)       # f32 rescale, cast back

inside the same jit trace — model definitions, training, and the bf16 path
are untouched. ``s_act`` is a per-conv-input scalar calibrated offline
(max-abs over calibration batches); ``s_w`` is per-output-channel and
derived from the captured kernel, so XLA constant-folds the quantized
weights at compile time. BatchNorm / ReLU / adds stay bf16 and fuse into
the conv epilogues as before.

Skipped (kept bf16): grouped/depthwise convs (VPU-bound, no MXU win),
convs with fewer than ``min_in_features`` input channels (the 3-channel
stem conv measured 0.96x in int8), and — by measured default — every conv
inside the hourglass stacks (see ``DEFAULT_SKIP_SUBSTRINGS``).
"""

from __future__ import annotations

import contextlib
from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

QUANT_NAME = "quant.json"


def _conv_path(module: nn.Module) -> str:
    return "/".join(module.path)


def _is_plain_conv(module, method_name: str) -> bool:
    return (
        type(module) is nn.Conv
        and method_name == "__call__"
        and module.feature_group_count == 1
    )


def _is_plain_conv_transpose(module, method_name: str) -> bool:
    """The hourglass unpools (ConvTranspose(4, s2), hourglass.py:71-79) —
    MXU contractions too, so they quantize the same way."""
    return (
        type(module) is nn.ConvTranspose
        and method_name == "__call__"
        and not module.transpose_kernel
    )


def _is_quantizable(module, method_name: str) -> bool:
    return _is_plain_conv(module, method_name) or _is_plain_conv_transpose(
        module, method_name
    )


def _conv_dims(module: nn.Module, x):
    """(strides, padding, dilation) normalized for lax.conv_general_dilated."""
    nd = x.ndim - 2
    strides = module.strides or 1
    if isinstance(strides, int):
        strides = (strides,) * nd
    padding = module.padding
    if isinstance(padding, int):
        padding = [(padding, padding)] * nd
    dilation = module.kernel_dilation or 1
    if isinstance(dilation, int):
        dilation = (dilation,) * nd
    return tuple(strides), padding, tuple(dilation)


@contextlib.contextmanager
def collect_activation_scales(stats: Dict[str, jax.Array],
                              percentile: Optional[float] = None,
                              per_channel: bool = False):
    """Context: running per-conv-input activation scales accumulate into
    ``stats``. Values stay on device; ``jax.device_get(stats)`` once at the end.

    percentile: clip scale at this percentile of |x| instead of max-abs
    (outlier-robust; the running reduction across batches is still max, so
    the result is the max over per-batch percentiles — conservative).
    per_channel: one scale per conv *input channel* (folded into the kernel
    at quantize time), instead of per tensor.
    """

    def _reduce(x):
        x = jnp.abs(x.astype(jnp.float32))
        if per_channel:
            flat = x.reshape(-1, x.shape[-1])
            if percentile is None:
                return jnp.max(flat, axis=0)
            return jnp.percentile(flat, percentile, axis=0)
        if percentile is None:
            return jnp.max(x)
        return jnp.percentile(x, percentile)

    def interceptor(next_fn, args, kwargs, context):
        if _is_quantizable(context.module, context.method_name):
            path = _conv_path(context.module)
            val = _reduce(args[0])
            prev = stats.get(path)
            stats[path] = val if prev is None else jnp.maximum(prev, val)
        return next_fn(*args, **kwargs)

    with nn.intercept_methods(interceptor):
        yield


def calibrate_activation_scales(apply_fn: Callable, batches: Iterable,
                                percentile: Optional[float] = None,
                                per_channel: bool = False) -> Dict:
    """Run ``apply_fn(batch)`` over calibration batches, return per-conv
    input activation scales keyed by flax module path: a float per conv, or
    a list of per-input-channel floats with ``per_channel=True``."""
    stats: Dict[str, jax.Array] = {}
    with collect_activation_scales(stats, percentile=percentile,
                                   per_channel=per_channel):
        for batch in batches:
            apply_fn(batch)
    if any(isinstance(v, jax.core.Tracer) for v in stats.values()):
        raise RuntimeError(
            "calibration saw tracers — apply_fn must run eagerly (not under jit)"
        )
    host = jax.device_get(stats)
    if per_channel:
        return {k: [float(s) for s in v] for k, v in host.items()}
    return {k: float(v) for k, v in host.items()}


class QuantizedActivation:
    """int8 tensor + its activation max-abs scale, handed between modules.

    Used for the stem's int8 handoff: a producer module's output is
    quantized ONCE and stored int8 in HBM (half the bf16 bytes), and the
    consumer convs — which would quantize the same tensor with the same
    calibrated scale anyway — consume it directly. Numerics are bit-equal
    to the unfused path; only the intermediate's dtype in memory changes.
    Exposes just enough array surface (shape/ndim/dtype) for module code
    that inspects its input (e.g. Residual reads x.shape[-1]).
    """

    __slots__ = ("q", "scale")

    def __init__(self, q, scale: float):
        self.q = q
        self.scale = scale

    @property
    def shape(self):
        return self.q.shape

    @property
    def ndim(self):
        return self.q.ndim

    @property
    def dtype(self):  # the logical (dequantized) dtype is irrelevant here
        return self.q.dtype


# Producer module path -> calibration key of the consumer conv that sets the
# handoff scale. The stem chain (CornerNet_Squeeze.py:66-72): pre_conv's
# output is consumed only by pre_res1's Conv_0/Conv_2 (same tensor, same
# calibrated scale), pre_res1's only by pre_res2's. pre_res2's output feeds
# fire modules whose identity-skip adds x in f32 — not eligible.
STEM_HANDOFFS = {
    "backbone/pre_conv": "backbone/pre_res1/Conv_0",
    "backbone/pre_res1": "backbone/pre_res2/Conv_0",
}

# Measured int8 placement (benchmarks/quant_skip_sweep.py, round 3, @96
# frames): quantizing the hourglass interior LOSES — the hg segment alone
# runs 0.93x under int8 (9.65 ms int8 vs 8.96 bf16,
# benchmarks/segment_profile.py) because its deep levels run at tiny
# spatial extents (8x8/4x4) where quant/dequant VPU overhead and f32
# skip-add boundaries beat the MXU win. Best full-model placement: int8
# everywhere EXCEPT "/hg_" paths (38.39 ms vs 38.99 int8-everywhere vs
# 51.54 bf16). Stem-only (43.99) and skipping heads too (39.09) both lose.
# Override with OKT_INT8_SKIP=<comma-separated path substrings> (empty
# string quantizes everything).
DEFAULT_SKIP_SUBSTRINGS = ("/hg_",)


def default_skip() -> Optional[Callable[[str], bool]]:
    """The measured-default skip predicate (see DEFAULT_SKIP_SUBSTRINGS)."""
    import os

    env = os.environ.get("OKT_INT8_SKIP")
    subs = (
        tuple(s for s in env.split(",") if s)
        if env is not None
        else DEFAULT_SKIP_SUBSTRINGS
    )
    if not subs:
        return None
    return lambda path: any(s in path for s in subs)


def make_quantize_interceptor(
    scales: Dict[str, float],
    min_in_features: int = 16,
    skip: Optional[Callable[[str], bool]] = None,
    handoffs: Optional[Dict[str, str]] = None,
):
    """Interceptor replacing eligible convs with calibrated int8 kernels.

    ``handoffs`` ({producer module path: consumer scale key}) stores the
    named producers' outputs as int8 in HBM and feeds consumer convs
    directly. See _default_handoffs for why this defaults to off."""
    if handoffs is None:
        handoffs = _default_handoffs()

    def interceptor(next_fn, args, kwargs, context):
        m = context.module
        path = "/".join(m.path) if m.path else ""
        if (
            context.method_name == "__call__"
            and path in handoffs
            and type(m).__name__ in ("ConvBlock", "Residual")
        ):
            consumer_scale = scales.get(handoffs[path])
            y = next_fn(*args, **kwargs)
            if consumer_scale is None or isinstance(consumer_scale, (list, tuple)):
                return y
            s_in = consumer_scale / 127.0
            q = jnp.clip(
                jnp.round(y.astype(jnp.float32) * (1.0 / s_in)), -127.0, 127.0
            ).astype(jnp.int8)
            return QuantizedActivation(q, consumer_scale)
        if not _is_quantizable(m, context.method_name):
            # unwrap for any non-conv consumer of a handoff (defensive; the
            # stem chain has none)
            if args and isinstance(args[0], QuantizedActivation):
                x = args[0]
                deq = x.q.astype(jnp.float32) * (x.scale / 127.0)
                return next_fn(deq, *args[1:], **kwargs)
            return next_fn(*args, **kwargs)
        path = _conv_path(m)
        x = args[0]
        wrapped = isinstance(x, QuantizedActivation)
        s_act = x.scale if wrapped else scales.get(path)
        per_channel = not wrapped and (
            isinstance(s_act, (list, tuple))
            or (hasattr(s_act, "ndim") and getattr(s_act, "ndim", 0) > 0)
        )

        def fallback():
            if wrapped:
                deq = x.q.astype(jnp.float32) * (x.scale / 127.0)
                return next_fn(deq.astype(m.dtype or jnp.float32),
                               *args[1:], **kwargs)
            return next_fn(*args, **kwargs)

        if (
            s_act is None
            or (not per_channel and s_act <= 0.0)
            or (per_channel and max(s_act) <= 0.0)
            or (skip is not None and skip(path))
        ):
            return fallback()
        kernel = m.get_variable("params", "kernel")  # HW I O
        if kernel is None or kernel.shape[-2] < min_in_features:
            return fallback()

        w = kernel.astype(jnp.float32)
        if per_channel:
            # per-input-channel activation scales, folded into the kernel's
            # I axis so the rescale stays per-output-channel (MXU-friendly)
            s_in = jnp.maximum(jnp.asarray(s_act, jnp.float32), 1e-12) / 127.0
            w = w * s_in.reshape((1,) * (w.ndim - 2) + (-1, 1))
        else:
            s_in = s_act / 127.0
        if wrapped:
            xq = x.q  # already quantized at exactly this scale by the producer
            x = x.q  # for the shape/strides helpers below
        else:
            xq = jnp.clip(
                jnp.round(x.astype(jnp.float32) * (1.0 / s_in)), -127.0, 127.0
            ).astype(jnp.int8)

        s_w = jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))) / 127.0
        s_w = jnp.maximum(s_w, 1e-12)
        wq = jnp.clip(jnp.round(w / s_w), -127.0, 127.0).astype(jnp.int8)

        if _is_plain_conv_transpose(m, context.method_name):
            strides = m.strides or (1,) * (x.ndim - 2)
            y = jax.lax.conv_transpose(
                xq,
                wq,
                strides,
                m.padding,
                rhs_dilation=m.kernel_dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                transpose_kernel=False,
                preferred_element_type=jnp.int32,
            )
        else:
            strides, padding, dilation = _conv_dims(m, x)
            y = jax.lax.conv_general_dilated(
                xq,
                wq,
                strides,
                padding,
                rhs_dilation=dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        y = y.astype(jnp.float32) * (s_w if per_channel else s_in * s_w)
        if m.use_bias:
            y = y + m.get_variable("params", "bias").astype(jnp.float32)
        out_dtype = m.dtype or (jnp.float32 if wrapped else x.dtype)
        return y.astype(out_dtype)

    return interceptor


def _default_handoffs() -> Dict[str, str]:
    """Off unless opted in via OKT_INT8_HANDOFF=1.

    Measured on the chip @32 frames: XLA's fusion ALREADY materializes the
    stem intermediates as int8 (the two consumers' quantize ops CSE into the
    producer's epilogue), so the explicit handoff is perf-neutral on the
    stem (8.12 -> 8.06 ms) and pessimizes the full model (13.3 -> 33.3 ms,
    a fusion/layout pathology). Kept as an opt-in because the numerics are
    proven identical and other model geometries may fuse differently."""
    import os

    if os.environ.get("OKT_INT8_HANDOFF", "0") == "1":
        return STEM_HANDOFFS
    return {}


@contextlib.contextmanager
def quantized(scales: Dict[str, float], min_in_features: int = 16,
              skip: Optional[Callable[[str], bool]] = None,
              handoffs: Optional[Dict[str, str]] = None):
    """Context manager: all eligible convs inside run int8.

    ``skip=None`` applies the measured-default placement (``default_skip``,
    hourglass interior stays bf16); pass ``skip=lambda p: False`` to
    quantize every eligible conv."""
    if skip is None:
        skip = default_skip()
    if handoffs is None:
        handoffs = _default_handoffs()
    with nn.intercept_methods(
        make_quantize_interceptor(scales, min_in_features=min_in_features,
                                  skip=skip, handoffs=handoffs)
    ):
        yield


def quantized_apply(model: nn.Module, variables, scales: Dict[str, float], *args,
                    min_in_features: int = 16,
                    skip: Optional[Callable[[str], bool]] = None,
                    handoffs: Optional[Dict[str, str]] = None, **kwargs):
    """``model.apply`` with eligible convs running int8 (jit-safe: call
    inside your own jit, or wrap the returned closure). ``skip`` keeps
    individual conv paths in bf16 (see benchmarks/quant_skip_sweep.py for
    the measured placement tradeoffs)."""
    with quantized(scales, min_in_features=min_in_features, skip=skip,
                   handoffs=handoffs):
        return model.apply(variables, *args, **kwargs)
