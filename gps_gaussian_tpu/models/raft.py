"""RAFT-Stereo disparity head, bidirectional-in-batch, iterative GRU refine.

Capability of reference core/raft_stereo_human.py: context encoder,
precomputed context z/q/r biases, all-pairs 1D correlation pyramid, ConvGRU
iterations with the epipolar projection (delta_flow.y = 0), convex x8
upsampling keeping the x component.

The bidirectional trick carries over: the input feature batch is the
stacked [left; right] images (2B), queries fmap12 = [f_l; f_r] are matched
against targets fmap21 = [f_r; f_l], so L->R and R->L disparities come out
of one batched pass (reference core/raft_stereo_human.py:36-37).

The iteration loop is unrolled python (iters is a static 3 in every recipe)
— each iteration is identical-weight (shared flax submodule), and XLA sees
a straight-line graph it can schedule/fuse freely.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gps_gaussian_tpu.models.encoders import MultiBasicEncoder
from gps_gaussian_tpu.models.layers import Conv
from gps_gaussian_tpu.models.update import BasicUpdateBlock
from gps_gaussian_tpu.ops.corr import build_corr_pyramid, lookup_corr_pyramid
from gps_gaussian_tpu.ops.sampling import convex_upsample, coords_grid


class RaftStereoHuman(nn.Module):
    encoder_dims: Sequence[int] = (32, 48, 96)
    hidden_dim: int = 96
    context_dim: int = 96
    corr_levels: int = 4
    corr_radius: int = 4
    downsample_factor: int = 8
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, fmap8, iters: int = 3, test_mode: bool = False):
        """fmap8: (2B, h, w, d2) 1/8-res features of the stacked stereo batch.

        Returns a list of full-res x-disparity maps (2B, H, W, 1), one per
        iteration (train) or just the final one (test_mode), all f32.
        """
        (hid, ctx), fmap1, fmap2 = MultiBasicEncoder(
            self.encoder_dims, self.hidden_dim, self.context_dim,
            dtype=self.dtype, name="cnet")(fmap8)
        fmap12 = jnp.concatenate([fmap1, fmap2], axis=0)
        fmap21 = jnp.concatenate([fmap2, fmap1], axis=0)

        net = nn.tanh(hid.astype(jnp.float32)).astype(
            hid.dtype if self.dtype is None else self.dtype)
        inp = nn.relu(ctx)
        # context z/q/r biases computed once (reference raft_stereo_human.py:43)
        czqr = Conv(self.hidden_dim * 3, 3, 1, 1, dtype=self.dtype,
                    name="context_zqr")(inp)
        cz, cr, cq = jnp.split(czqr, 3, axis=-1)

        # correlation volume: f32 accumulation regardless of compute dtype
        pyramid = build_corr_pyramid(fmap12, fmap21,
                                     num_levels=self.corr_levels)

        b2, h, w, _ = fmap8.shape
        coords0 = coords_grid(b2, h, w)          # (2B, h, w, 2), f32
        coords1 = coords0

        update = BasicUpdateBlock(
            self.hidden_dim, self.downsample_factor, dtype=self.dtype,
            name="update_block")

        predictions = []
        for it in range(iters):
            coords1 = jax.lax.stop_gradient(coords1)
            corr = lookup_corr_pyramid(pyramid, coords1[..., 0],
                                       radius=self.corr_radius)
            flow = coords1 - coords0
            net, mask, delta_flow = update(
                net, (cz, cr, cq),
                flow.astype(corr.dtype) if self.dtype is None
                else flow.astype(self.dtype),
                corr if self.dtype is None else corr.astype(self.dtype))
            # epipolar projection: rectified pairs move along x only
            delta_flow = delta_flow.at[..., 1].set(0.0)
            coords1 = coords1 + delta_flow

            if test_mode and it < iters - 1:
                continue
            flow_up = convex_upsample(coords1 - coords0, mask,
                                      self.downsample_factor)
            predictions.append(flow_up[..., :1])  # keep x-disparity

        return predictions
