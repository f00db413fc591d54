"""TPU-native image ops.

These are the XLA-friendly equivalents of the library kernels the PyTorch
reference delegates to (cuDNN convs, scipy C filters, torch Upsample/Pool):

- :mod:`resize`  -- bilinear resize (align_corners=False parity) & avg-pool
- :mod:`pooling` -- PyTorch-semantics adaptive max pooling
- :mod:`filters` -- median filter / grey closing / box filter / gaussian blur
  built on ``lax.reduce_window`` & shifted-slice stacks (used by the
  on-device cloud & shadow detector)
- :mod:`ssim`    -- gaussian-window SSIM (util/pytorch_ssim parity)
"""

from uncrtaints_tpu.ops.resize import upsample_bilinear, avg_pool2d
from uncrtaints_tpu.ops.pooling import adaptive_max_pool2d
from uncrtaints_tpu.ops.filters import (
    median_filter2d, grey_closing, box_filter2d, gaussian_filter2d,
)
from uncrtaints_tpu.ops.ssim import ssim

__all__ = [
    "upsample_bilinear", "avg_pool2d", "adaptive_max_pool2d",
    "median_filter2d", "grey_closing", "box_filter2d", "gaussian_filter2d",
    "ssim",
]
