"""Flax model zoo (NHWC, TPU-native layouts).

Backbones mirroring the reference capability surface
(/root/reference/model/src/backbones/):

- :class:`UNCRTAINTS`  -- the paper model (L-TAE attention + MBConv blocks)
- :class:`UNet`        -- mono-temporal U-Net (pretraining)
- :class:`UTAE`        -- U-Net encoder/decoder with L-TAE bottleneck
- :class:`UNet3D`      -- 3-D conv U-Net over (T,H,W)
- :class:`RecUNet`     -- recurrent U-Net (ConvLSTM/BConvLSTM/mean)
- :class:`FPNConvLSTM` -- atrous feature pyramid + ConvLSTM

All modules consume [B, T, H, W, C] inputs (channels last) and return
[B, 1, H, W, C_out] predictions with mean/variance stacked on the channel
axis; see ``get_generator`` for config-driven construction.
"""

from uncrtaints_tpu.models.uncrtaints import UNCRTAINTS
from uncrtaints_tpu.models.registry import get_generator, mean_vars_idx

__all__ = ["UNCRTAINTS", "get_generator", "mean_vars_idx"]
