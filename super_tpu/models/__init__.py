"""Perception models (flax): depth, segmentation, optical flow.

TPU-native counterparts of the reference model zoo (SURVEY.md section 2.4):
monodepth2 (ResNet encoder + U-Net depth decoder), RAFT-Stereo (GRU
recurrence as lax.scan), DeepLabV3+-style segmentation, and RAFT optical
flow.  All are inference-parity flax modules with torch-checkpoint
converters (the reference ships torch checkpoints).
"""

from super_tpu.models.resnet import ResNetEncoder  # noqa: F401
from super_tpu.models.monodepth2 import (  # noqa: F401
    DepthDecoder,
    Monodepth2,
    batch_post_process_disparity,
)
