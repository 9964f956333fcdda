"""Model family: CornerNet-Squeeze hourglass backbone + KeypointNet heads.

Reference: perception/models.py (first-party) and the vendored
perception/corner_net_lite/core/models/* (backbone definition).
"""

from object_keypoints_tpu.models.blocks import (
    ConvBlock,
    Residual,
    FireModule,
    torch_conv_kernel_init,
)
from object_keypoints_tpu.models.hourglass import (
    FireHourglass,
    HourglassStack,
    ResidualHourglass,
)
from object_keypoints_tpu.models.cornernet import (
    CornerNetModel,
    CornerPoolBlock,
    cornernet,
    cornernet_saccade,
    cornernet_squeeze,
)
from object_keypoints_tpu.models.keypoint_net import (
    KeypointNet,
    KeypointNetOutputs,
    init_keypoint_net,
)
from object_keypoints_tpu.ops.decode import maxpool_nms as nms  # models.py:55-58 parity

__all__ = [
    "ConvBlock",
    "Residual",
    "FireModule",
    "torch_conv_kernel_init",
    "FireHourglass",
    "HourglassStack",
    "ResidualHourglass",
    "CornerNetModel",
    "CornerPoolBlock",
    "cornernet",
    "cornernet_saccade",
    "cornernet_squeeze",
    "KeypointNet",
    "KeypointNetOutputs",
    "init_keypoint_net",
    "nms",
]
