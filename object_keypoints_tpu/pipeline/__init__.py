"""Inference pipeline (reference: perception/pipeline.py + restored stereo
components from the reference's test API)."""

from object_keypoints_tpu.pipeline.components import (
    InferenceComponent,
    KeypointExtractionComponent,
    ObjectExtraction,
    DetectionToPoint,
    TriangulationComponent,
    AssociationComponent,
    ObjectKeypointPipeline,
    LearnedKeypointTrackingPipeline,
)
from object_keypoints_tpu.pipeline.decode_jit import (
    CameraArrays,
    DecodedObjects,
    decode_objects,
    decode_objects_batch,
)
from object_keypoints_tpu.pipeline.stereo_jit import (
    StereoDecoded,
    StereoKeypointPipeline,
    StereoRigArrays,
    stereo_decode_triangulate,
)

__all__ = [
    "InferenceComponent",
    "KeypointExtractionComponent",
    "ObjectExtraction",
    "DetectionToPoint",
    "TriangulationComponent",
    "AssociationComponent",
    "ObjectKeypointPipeline",
    "LearnedKeypointTrackingPipeline",
    "CameraArrays",
    "DecodedObjects",
    "decode_objects",
    "decode_objects_batch",
    "StereoDecoded",
    "StereoKeypointPipeline",
    "StereoRigArrays",
    "stereo_decode_triangulate",
]
