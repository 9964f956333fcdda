"""Serving: model export + AOT-compiled inference artifacts + int8 PTQ."""

from object_keypoints_tpu.serving.export import (
    export_model,
    load_model,
    load_inference_fn,
    load_quant_scales,
)
from object_keypoints_tpu.serving.quantize import (
    calibrate_activation_scales,
    quantized_apply,
)

__all__ = [
    "export_model",
    "load_model",
    "load_inference_fn",
    "load_quant_scales",
    "calibrate_activation_scales",
    "quantized_apply",
]
