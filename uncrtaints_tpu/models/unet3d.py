"""UNet3D: 3-D convolutional U-Net over (T, H, W) with masked temporal mean.

NHWC(T) re-design of /root/reference/model/src/backbones/unet3d.py:14-120.
Layout here is [B, T, H, W, C] throughout (channels last; the reference
permutes to BxCxTxHxW). The reference's out-nonlinearity slices its 4-D
output on the H axis (unet3d.py:112-113, a latent bug in an off-CLI model);
we apply it to the channel axis as intended.
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from uncrtaints_tpu.models.layers import conv_kernel_init, bias_normal_init, bn_scale_init
from uncrtaints_tpu.models.unet import mean_var_heads

S2_BANDS = 13


class BatchNorm3d(nn.Module):
    """BatchNorm over (B, T, H, W) per channel, torch BatchNorm3d parity."""
    @nn.compact
    def __call__(self, x, train: bool = False):
        return nn.BatchNorm(use_running_average=not train, momentum=0.9,
                            epsilon=1e-5, scale_init=bn_scale_init)(x)


class Conv3dBlock(nn.Module):
    """[Conv3d + BN + LeakyReLU] x2 (unet3d.py:14-23)."""
    mid: int
    out: int

    @nn.compact
    def __call__(self, x, train: bool = False):
        for ch in (self.mid, self.out):
            x = nn.Conv(ch, kernel_size=(3, 3, 3), padding=1,
                        kernel_init=conv_kernel_init,
                        bias_init=bias_normal_init)(x)
            x = BatchNorm3d()(x, train=train)
            x = nn.leaky_relu(x, 0.01)
        return x


class UNet3D(nn.Module):
    in_channel: int
    out_channel: int = S2_BANDS
    feats: int = 8
    pad_value: float = 0.0
    out_nonlin_mean: bool = False
    out_nonlin_var: str = "relu"

    @nn.compact
    def __call__(self, x, batch_positions=None, train: bool = False):
        # x: [B, T, H, W, C]; nn.Conv with 3 spatial dims treats (T, H, W)
        f = self.feats
        pad_mask = jnp.all(x == self.pad_value, axis=(2, 3, 4))  # [B, T]

        en3 = Conv3dBlock(f * 4, f * 4, name="en3")(x, train=train)
        p3 = nn.max_pool(en3, (2, 2, 2), strides=(2, 2, 2))
        en4 = Conv3dBlock(f * 8, f * 8, name="en4")(p3, train=train)
        p4 = nn.max_pool(en4, (2, 2, 2), strides=(2, 2, 2))

        c_in = nn.Conv(f * 16, kernel_size=(3, 3, 3), padding=1,
                       kernel_init=conv_kernel_init,
                       bias_init=bias_normal_init, name="center_in")(p4)
        c_in = BatchNorm3d()(c_in, train=train)
        c_in = nn.leaky_relu(c_in, 0.01)

        c = nn.Conv(f * 16, kernel_size=(3, 3, 3), padding=1,
                    kernel_init=conv_kernel_init,
                    bias_init=bias_normal_init)(c_in)
        c = BatchNorm3d()(c, train=train)
        c = nn.leaky_relu(c, 0.01)
        # torch ConvTranspose3d(k3,s2,p1,output_padding=1) == flax padding
        # ((1,2),(1,2),(1,2)) with spatially-flipped IO kernel (verified
        # numerically; "SAME" does NOT match)
        c_out = nn.ConvTranspose(f * 8, kernel_size=(3, 3, 3),
                                 strides=(2, 2, 2),
                                 padding=((1, 2), (1, 2), (1, 2)),
                                 kernel_init=conv_kernel_init,
                                 bias_init=bias_normal_init,
                                 name="center_out")(c)

        cat4 = jnp.concatenate(
            [c_out, en4[:, :c_out.shape[1]]], axis=-1)
        dc4 = Conv3dBlock(f * 8, f * 8, name="dc4")(cat4, train=train)
        tr3 = nn.ConvTranspose(f * 4, kernel_size=(3, 3, 3), strides=(2, 2, 2),
                               padding=((1, 2), (1, 2), (1, 2)),
                               kernel_init=conv_kernel_init,
                               bias_init=bias_normal_init, name="trans3")(dc4)
        tr3 = BatchNorm3d()(tr3, train=train)
        tr3 = nn.leaky_relu(tr3, 0.01)
        cat3 = jnp.concatenate([tr3, en3[:, :tr3.shape[1]]], axis=-1)
        dc3 = Conv3dBlock(f * 4, f * 2, name="dc3")(cat3, train=train)
        final = nn.Conv(self.out_channel, kernel_size=(3, 3, 3), padding=1,
                        kernel_init=conv_kernel_init,
                        bias_init=bias_normal_init, name="final")(dc3)

        # masked temporal mean (unet3d.py:99-110)
        keep = (~pad_mask[:, :final.shape[1]]).astype(final.dtype)
        denom = jnp.maximum(keep.sum(axis=1), 1.0)
        out = (final * keep[:, :, None, None, None]).sum(axis=1) / \
            denom[:, None, None, None]

        if self.out_nonlin_mean or self.out_nonlin_var != "none":
            out = mean_var_heads(out, self.out_nonlin_mean, self.out_nonlin_var)
        return out[:, None]  # [B, 1, H, W, C_out]
