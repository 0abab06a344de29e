"""Image U-Net encoder and context encoder (capability of core/extractor.py).

`UnetExtractor` produces features at 1/2, 1/4, 1/8 resolution;
`MultiBasicEncoder` maps the 1/8 features to RAFT context (hidden / input)
plus the left/right matching feature maps via the reference's
batch-stacking trick (left images occupy batch[:bs], right batch[bs:],
core/extractor.py:94-117).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax.numpy as jnp
from flax import linen as nn

from gps_gaussian_tpu.models.layers import Conv, GroupNorm32, ResidualBlock


class UnetExtractor(nn.Module):
    """5x5 s2 stem + three residual stages (reference core/extractor.py:63-91)."""

    encoder_dims: Sequence[int] = (32, 48, 96)
    norm_fn: str = "group"
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d0, d1, d2 = self.encoder_dims
        x = Conv(32, 5, 2, 2, dtype=self.dtype, name="in_conv")(x)
        x = GroupNorm32(num_groups=8)(x)
        x = nn.relu(x)

        x1 = ResidualBlock(d0, 1, self.norm_fn, self.dtype, name="res1a")(x)
        x1 = ResidualBlock(d0, 1, self.norm_fn, self.dtype, name="res1b")(x1)
        x2 = ResidualBlock(d1, 2, self.norm_fn, self.dtype, name="res2a")(x1)
        x2 = ResidualBlock(d1, 1, self.norm_fn, self.dtype, name="res2b")(x2)
        x3 = ResidualBlock(d2, 2, self.norm_fn, self.dtype, name="res3a")(x2)
        x3 = ResidualBlock(d2, 1, self.norm_fn, self.dtype, name="res3b")(x3)
        return x1, x2, x3


class MultiBasicEncoder(nn.Module):
    """Context + matching-feature heads on the 1/8 features.

    Returns ((hidden, context), fmap_left, fmap_right); the feature head
    outputs 2*d2 channels split batch-wise into the two views
    (reference core/extractor.py:94-117).
    """

    encoder_dims: Sequence[int] = (32, 48, 96)
    hidden_dim: int = 96
    context_dim: int = 96
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        d2 = self.encoder_dims[2]
        bs2 = x.shape[0]

        f = ResidualBlock(d2, 1, "group", self.dtype, name="feat_res")(x)
        f = Conv(d2 * 2, 3, 1, 1, dtype=self.dtype, name="feat_out")(f)
        fmap1, fmap2 = f[: bs2 // 2], f[bs2 // 2:]

        h = ResidualBlock(d2, 1, "group", self.dtype, name="hidden_res")(x)
        h = Conv(self.hidden_dim, 3, 1, 1, dtype=self.dtype,
                 name="hidden_out")(h)
        c = ResidualBlock(d2, 1, "group", self.dtype, name="context_res")(x)
        c = Conv(self.context_dim, 3, 1, 1, dtype=self.dtype,
                 name="context_out")(c)
        return (h, c), fmap1, fmap2
