"""Gaussian-parameter regressor: depth U-Net + skip-fused decoder + heads.

Capability of reference lib/gs_parm_network.py (GSRegresser): a depth
encoder mirrors the image encoder; per-scale features are concatenated and
decoded with 2x bilinear upsampling between scales; three heads emit
rotation (L2-normalised quaternion), scale (Softplus(beta=100) clamped at
0.01) and opacity (sigmoid).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

import jax

from gps_gaussian_tpu.models.encoders import UnetExtractor
from gps_gaussian_tpu.models.layers import Conv, ResidualBlock


def _up2(x):
    """nn.Upsample(scale_factor=2, mode='bilinear'), align_corners=False.

    jax.image.resize('linear') uses the same half-pixel convention and
    lowers to a dense conv-style kernel — far faster than a gather-based
    sampler at full resolution."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, h * 2, w * 2, c), method="linear")


class GSRegresser(nn.Module):
    rgb_dims: Sequence[int] = (32, 48, 96)     # image-encoder dims
    depth_dims: Sequence[int] = (32, 48, 96)   # gsnet.encoder_dims
    decoder_dims: Sequence[int] = (48, 64, 96)
    head_dim: int = 32
    norm_fn: str = "group"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, img, depth, img_feat):
        """img (2B,H,W,3) in [-1,1]; depth (2B,H,W,1) inverse depth;
        img_feat: the encoder's (1/2, 1/4, 1/8) features.
        Returns rot (2B,H,W,4), scale (2B,H,W,3), opacity (2B,H,W,1), f32.
        """
        img_feat1, img_feat2, img_feat3 = img_feat
        d1, d2, d3 = UnetExtractor(self.depth_dims, self.norm_fn, self.dtype,
                                   name="depth_encoder")(depth)

        dd = self.decoder_dims
        feat3 = jnp.concatenate([img_feat3, d3], axis=-1)
        feat2 = jnp.concatenate([img_feat2, d2], axis=-1)
        feat1 = jnp.concatenate([img_feat1, d1], axis=-1)

        up3 = ResidualBlock(dd[2], 1, self.norm_fn, self.dtype,
                            name="dec3a")(feat3)
        up3 = ResidualBlock(dd[2], 1, self.norm_fn, self.dtype,
                            name="dec3b")(up3)
        up3 = _up2(up3)
        up2 = ResidualBlock(dd[1], 1, self.norm_fn, self.dtype, name="dec2a")(
            jnp.concatenate([up3, feat2], axis=-1))
        up2 = ResidualBlock(dd[1], 1, self.norm_fn, self.dtype,
                            name="dec2b")(up2)
        up2 = _up2(up2)
        up1 = ResidualBlock(dd[0], 1, self.norm_fn, self.dtype, name="dec1a")(
            jnp.concatenate([up2, feat1], axis=-1))
        up1 = ResidualBlock(dd[0], 1, self.norm_fn, self.dtype,
                            name="dec1b")(up1)
        up1 = _up2(up1)

        out = jnp.concatenate(
            [up1, img.astype(up1.dtype), depth.astype(up1.dtype)], axis=-1)
        out = nn.relu(Conv(self.head_dim, 3, 1, 1, dtype=self.dtype,
                           name="out_conv")(out))

        # the three per-head 3x3 convs (reference gs_parm_network.py:34-50)
        # fuse into ONE conv over 3*head_dim output channels: identical
        # math (independent output channels), but one full-res MXU pass
        # with 3x the lane packing instead of three 25%-packed passes —
        # these full-res small-channel convs dominate the gsnet decoder
        # on TPU (bench/model_bench.py)
        hd = self.head_dim
        h1 = nn.relu(Conv(3 * hd, 3, 1, 1, dtype=self.dtype,
                          name="head_conv1")(out))

        rot = Conv(4, 1, 1, 0, dtype=self.dtype,
                   name="rot_conv2")(h1[..., 0:hd])
        rot = rot.astype(jnp.float32)
        rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True).clip(1e-12)

        scale = Conv(3, 1, 1, 0, dtype=self.dtype,
                     name="scale_conv2")(h1[..., hd:2 * hd])
        scale = scale.astype(jnp.float32)
        # Softplus(beta=100), clamped at 0.01 (reference gs_parm_network.py:73)
        scale = jnp.minimum(nn.softplus(scale * 100.0) / 100.0, 0.01)

        opacity = Conv(1, 1, 1, 0, dtype=self.dtype,
                       name="opacity_conv2")(h1[..., 2 * hd:3 * hd])
        opacity = nn.sigmoid(opacity.astype(jnp.float32))

        return rot, scale, opacity
