"""GRU update block: motion encoder, ConvGRU, flow + upsample-mask heads.

Capability of reference core/update.py (BasicMotionEncoder, ConvGRU,
FlowHead, BasicMultiUpdateBlock) for the n_gru_layers=1 configuration the
reference actually trains (both yamls; deeper GRU stacks are dead config —
SURVEY.md §2.1 #7).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from gps_gaussian_tpu.models.layers import Conv


class FlowHead(nn.Module):
    """conv3x3 -> relu -> conv3x3 (reference core/update.py:6-14)."""

    hidden_dim: int = 256
    out_dim: int = 2
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x):
        x = nn.relu(Conv(self.hidden_dim, 3, 1, 1, dtype=self.dtype,
                         name="conv1")(x))
        return Conv(self.out_dim, 3, 1, 1, dtype=self.dtype, name="conv2")(x)


class ConvGRU(nn.Module):
    """Conv gated recurrent unit with precomputed context biases.

    h' = (1-z) h + z tanh(Wq [r*h, x] + cq);  z/r from Wz/Wr [h, x] + cz/cr
    (reference core/update.py:16-32).  Gate math in f32 for stability.
    """

    hidden_dim: int
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, h, cz, cr, cq, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid((Conv(self.hidden_dim, 3, 1, 1, dtype=self.dtype,
                             name="convz")(hx) + cz).astype(jnp.float32))
        r = nn.sigmoid((Conv(self.hidden_dim, 3, 1, 1, dtype=self.dtype,
                             name="convr")(hx) + cr).astype(jnp.float32))
        rh_x = jnp.concatenate([(r.astype(h.dtype)) * h, x], axis=-1)
        q = nn.tanh((Conv(self.hidden_dim, 3, 1, 1, dtype=self.dtype,
                          name="convq")(rh_x) + cq).astype(jnp.float32))
        h32 = h.astype(jnp.float32)
        return ((1.0 - z) * h32 + z * q).astype(h.dtype)


class BasicMotionEncoder(nn.Module):
    """Fuse correlation taps + current flow into 128ch motion features
    (reference core/update.py:66-87); output = [fused(126), flow(2)]."""

    corr_channels: int = 36  # corr_levels * (2*radius+1)
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(Conv(64, 1, 1, 0, dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(Conv(64, 3, 1, 1, dtype=self.dtype, name="convc2")(c))
        f = nn.relu(Conv(64, 7, 1, 3, dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(Conv(64, 3, 1, 1, dtype=self.dtype, name="convf2")(f))
        out = nn.relu(Conv(126, 3, 1, 1, dtype=self.dtype, name="conv")(
            jnp.concatenate([c, f], axis=-1)))
        return jnp.concatenate([out, flow.astype(out.dtype)], axis=-1)


class BasicUpdateBlock(nn.Module):
    """One GRU level at 1/8 res + flow and upsample-mask heads
    (reference core/update.py:98-138 with n_gru_layers=1)."""

    hidden_dim: int = 96
    downsample_factor: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, net, context_zqr, flow, corr):
        cz, cr, cq = context_zqr
        motion = BasicMotionEncoder(dtype=self.dtype, name="encoder")(
            flow, corr)
        net = ConvGRU(self.hidden_dim, dtype=self.dtype, name="gru08")(
            net, cz, cr, cq, motion)

        delta_flow = FlowHead(256, 2, dtype=self.dtype, name="flow_head")(net)

        mask = nn.relu(Conv(256, 3, 1, 1, dtype=self.dtype,
                            name="mask_conv1")(net))
        mask = Conv((self.downsample_factor ** 2) * 9, 1, 1, 0,
                    dtype=self.dtype, name="mask_conv2")(mask)
        # 0.25 scaling balances gradients (reference core/update.py:137)
        return net, 0.25 * mask.astype(jnp.float32), \
            delta_flow.astype(jnp.float32)
