"""Pallas TPU kernels — the hand-scheduled perf layer.

Only ops where XLA's lowering measurably misses the roofline get kernels;
everything keeps an XLA fallback (interpret-able on CPU for tests).
"""

from object_keypoints_tpu.ops.pallas.stem_conv import fused_stem_conv

__all__ = ["fused_stem_conv"]
