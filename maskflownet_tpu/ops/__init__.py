"""TPU-native ops for dense matching: correlation, warping, deformable conv,
triangle resampling. Pure-XLA reference paths live here; fused Pallas kernels
live in ``maskflownet_tpu.ops.pallas`` and are selected automatically on TPU.
"""

from maskflownet_tpu.ops.correlation import correlation, correlation_xla
from maskflownet_tpu.ops.deform import deform_conv, flow_guided_deform_conv3x3
from maskflownet_tpu.ops.resample import downsample, resize_bilinear, upsample
from maskflownet_tpu.ops.warp import (affine_grid, backwarp, backwarp_coords,
                                      grid_sample_normalized)

__all__ = [
    "affine_grid", "backwarp", "backwarp_coords", "correlation",
    "correlation_xla", "deform_conv", "downsample",
    "flow_guided_deform_conv3x3", "grid_sample_normalized", "resize_bilinear",
    "upsample",
]
