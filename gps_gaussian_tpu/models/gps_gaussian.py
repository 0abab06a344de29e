"""Full GPS-Gaussian model: stereo encoder + RAFT disparity + GS regressor.

Capability of reference lib/network.py (RtStereoHumanModel): the stereo pair
is stacked on the batch axis (left batch[:B], right batch[B:]), one shared
U-Net encodes both, RAFT-Stereo predicts bidirectional disparity, and (in
gs mode) disparity becomes inverse depth -> world points while a U-Net
decoder regresses per-pixel rotation/scale/opacity.

Outputs are typed fixed-shape pytrees (GaussianMaps per view) instead of the
reference's mutable dict; background pixels stay as masked Gaussians
(valid=0) so every shape is static under jit (SURVEY.md §7 step 1).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from gps_gaussian_tpu.geometry.pointcloud import (flow_to_inv_depth,
                                                  inv_depth_to_points)
from gps_gaussian_tpu.models.encoders import UnetExtractor
from gps_gaussian_tpu.models.gsnet import GSRegresser
from gps_gaussian_tpu.models.raft import RaftStereoHuman
from gps_gaussian_tpu.utils.containers import (GaussianMaps, SourceView,
                                               StereoSample)


@struct.dataclass
class GPSGaussianOutput:
    """flow_preds: per-iteration full-res x-disparity, each (2B, H, W, 1)
    with left in batch[:B], right in batch[B:]."""

    flow_preds: Tuple[jnp.ndarray, ...]
    lmain_gs: Optional[GaussianMaps] = None
    rmain_gs: Optional[GaussianMaps] = None

    @property
    def final_flow(self) -> jnp.ndarray:
        return self.flow_preds[-1]


class GPSGaussianModel(nn.Module):
    encoder_dims: Sequence[int] = (32, 48, 96)
    hidden_dim: int = 96
    context_dim: int = 96
    corr_levels: int = 4
    corr_radius: int = 4
    gsnet_encoder_dims: Sequence[int] = (32, 48, 96)
    gsnet_decoder_dims: Sequence[int] = (48, 64, 96)
    gsnet_head_dim: int = 32
    with_gs: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, sample: StereoSample, iters: int = 3,
                 test_mode: bool = False) -> GPSGaussianOutput:
        bs = sample.lmain.img.shape[0]
        image = jnp.concatenate([sample.lmain.img, sample.rmain.img], axis=0)
        if self.dtype is not None:
            image = image.astype(self.dtype)

        img_feat = UnetExtractor(self.encoder_dims, dtype=self.dtype,
                                 name="img_encoder")(image)
        preds = RaftStereoHuman(
            self.encoder_dims, self.hidden_dim, self.context_dim,
            self.corr_levels, self.corr_radius, dtype=self.dtype,
            name="raft_stereo")(img_feat[2], iters=iters,
                                test_mode=test_mode)

        if not self.with_gs:
            return GPSGaussianOutput(flow_preds=tuple(preds))

        flow_final = preds[-1]  # (2B, H, W, 1) f32

        # flow -> inverse depth -> world points, per view
        # (reference lib/network.py:64-79 flow2gsparms)
        views = (sample.lmain, sample.rmain)
        depths, xyzs, valids = [], [], []
        for i, view in enumerate(views):
            flow_v = flow_final[i * bs:(i + 1) * bs]
            inv_depth = flow_to_inv_depth(flow_v, view.intr, view.ref_intr,
                                          view.tf_x, view.mask)
            xyz = inv_depth_to_points(inv_depth[..., 0], view.extr, view.intr)
            depths.append(inv_depth)
            xyzs.append(xyz)
            valids.append((inv_depth != 0.0).astype(jnp.float32))

        lr_depth = jnp.concatenate(depths, axis=0)  # (2B, H, W, 1)
        rot, scale, opacity = GSRegresser(
            self.encoder_dims, self.gsnet_encoder_dims,
            self.gsnet_decoder_dims, self.gsnet_head_dim, dtype=self.dtype,
            name="gs_regresser")(
                image,
                lr_depth.astype(image.dtype) if self.dtype else lr_depth,
                img_feat)

        def gs_maps(i: int, view: SourceView) -> GaussianMaps:
            sl = slice(i * bs, (i + 1) * bs)
            return GaussianMaps(
                xyz=xyzs[i],
                rgb=view.img.astype(jnp.float32) * 0.5 + 0.5,
                rot=rot[sl], scale=scale[sl], opacity=opacity[sl],
                valid=valids[i], depth=depths[i])

        return GPSGaussianOutput(
            flow_preds=tuple(preds),
            lmain_gs=gs_maps(0, sample.lmain),
            rmain_gs=gs_maps(1, sample.rmain))
