"""Serving: model export + AOT-compiled inference artifacts."""

from object_keypoints_tpu.serving.export import (
    export_model,
    load_model,
    load_inference_fn,
)

__all__ = ["export_model", "load_model", "load_inference_fn"]
