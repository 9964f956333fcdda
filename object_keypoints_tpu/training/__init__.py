"""Training: losses, optimizer/schedule, pjit train step, checkpoints."""

from object_keypoints_tpu.training.losses import KeypointLoss, keypoint_loss

__all__ = ["KeypointLoss", "keypoint_loss"]
