"""Core TPU compute primitives: rotations, sampling, morphology, rasterization, flows."""

from ipercore_tpu.ops.rotations import (
    rodrigues,
    rotmat_to_rot6d,
    rot6d_to_rotmat,
    axis_angle_to_rot6d,
    rot6d_to_axis_angle,
    rotmat_to_axis_angle,
)
from ipercore_tpu.ops.sampling import grid_sample, resize_flow
from ipercore_tpu.ops.morphology import erode, dilate, morph, soft_edge
