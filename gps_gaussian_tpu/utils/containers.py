"""Typed, fixed-shape pytrees — the inter-layer data contract.

The reference moves data between layers through a single mutable nested dict
with keys 'lmain'/'rmain'/'novel_view' (reference lib/human_loader.py:366,
lib/network.py:41-47, lib/GaussianRender.py:16-39).  On TPU every shape must
be static under jit, so this build replaces the dict ABI with frozen
dataclass pytrees.  All image tensors are NHWC (TPU-native layout; the
reference is NCHW).

Conventions
-----------
* "inverse depth": every `depth` array in this framework stores 1/z, exactly
  like the reference (see SURVEY.md §3.5; reference lib/utils.py:97,113-120).
* images are float32 in [-1, 1], pre-multiplied by the foreground mask
  (reference lib/human_loader.py:322-327).
* intrinsics are 3x3 pinhole K, extrinsics are 3x4 world->camera [R|t].
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class SourceView:
    """One rectified source view of a stereo pair (batched).

    Mirrors the reference's lmain/rmain dict entries
    (lib/human_loader.py:333-349).
    """

    img: jnp.ndarray        # (B, H, W, 3) float in [-1, 1], masked
    mask: jnp.ndarray       # (B, H, W, 1) float {0, 1}
    intr: jnp.ndarray       # (B, 3, 3) rectified intrinsics of this view
    ref_intr: jnp.ndarray   # (B, 3, 3) rectified intrinsics of the other view
    extr: jnp.ndarray       # (B, 3, 4) rectified extrinsics (world -> cam)
    tf_x: jnp.ndarray       # (B,) signed rectified baseline term P1[0, 3]
                            # (+Tf_x for lmain, -Tf_x for rmain;
                            #  lib/human_loader.py:339,348)
    flow: Optional[jnp.ndarray] = None   # (B, H, W, 1) GT disparity-flow
    valid: Optional[jnp.ndarray] = None  # (B, H, W, 1) eroded validity {0,1}

    @property
    def batch(self) -> int:
        return self.img.shape[0]

    @property
    def res(self) -> tuple[int, int]:
        return self.img.shape[1], self.img.shape[2]


@struct.dataclass
class NovelCamera:
    """Target camera for splatting, batched.

    Equivalent of the reference's novel_view camera tensors
    (lib/human_loader.py:230-241, lib/utils.py:33-54), but stored in plain
    math convention: `view @ [x;1]` is the camera-space point and
    `proj @ [x;1]` the clip-space point (the reference keeps both transposed
    for the row-vector CUDA rasterizer).
    """

    view: jnp.ndarray        # (B, 4, 4) world -> camera
    proj: jnp.ndarray        # (B, 4, 4) full projection  P_gl @ view
    cam_center: jnp.ndarray  # (B, 3) camera center in world space
    tanfovx: jnp.ndarray     # (B,)
    tanfovy: jnp.ndarray     # (B,)
    height: int = struct.field(pytree_node=False, default=0)
    width: int = struct.field(pytree_node=False, default=0)

    @property
    def batch(self) -> int:
        return self.view.shape[0]


@struct.dataclass
class NovelView:
    """Novel-view target: camera plus (during training) the GT image."""

    camera: NovelCamera
    img: Optional[jnp.ndarray] = None   # (B, H, W, 3) float in [0, 1]
    # raw interpolated intr/extr, used by the point-splat preview
    # (reference lib/utils.py:58-85)
    intr: Optional[jnp.ndarray] = None  # (B, 3, 3)
    extr: Optional[jnp.ndarray] = None  # (B, 3, 4)


@struct.dataclass
class StereoSample:
    """A full training/inference sample (batched stereo pair + novel view)."""

    lmain: SourceView
    rmain: SourceView
    novel: Optional[NovelView] = None

    @property
    def batch(self) -> int:
        return self.lmain.batch


@struct.dataclass
class GaussianMaps:
    """Per-pixel Gaussian parameters for ONE source view (batched).

    The static-shape replacement for the reference's boolean-mask gather
    (lib/GaussianRender.py:16-27): every pixel carries a Gaussian; `valid`
    masks background pixels instead of dropping them (SURVEY.md §7 step 1).
    """

    xyz: jnp.ndarray      # (B, H, W, 3) world-space means
    rgb: jnp.ndarray      # (B, H, W, 3) colors in [0, 1]
    rot: jnp.ndarray      # (B, H, W, 4) unit quaternions (w, x, y, z)
    scale: jnp.ndarray    # (B, H, W, 3) positive scales, clamped <= 0.01
    opacity: jnp.ndarray  # (B, H, W, 1) in (0, 1)
    valid: jnp.ndarray    # (B, H, W, 1) float {0, 1}: depth != 0
    depth: jnp.ndarray    # (B, H, W, 1) inverse depth (1/z)

    def flatten(self) -> "FlatGaussians":
        b, h, w, _ = self.xyz.shape
        n = h * w
        return FlatGaussians(
            xyz=self.xyz.reshape(b, n, 3),
            rgb=self.rgb.reshape(b, n, 3),
            rot=self.rot.reshape(b, n, 4),
            scale=self.scale.reshape(b, n, 3),
            opacity=self.opacity.reshape(b, n, 1),
            valid=self.valid.reshape(b, n),
        )


@struct.dataclass
class FlatGaussians:
    """Flattened Gaussian set (batched, fixed-size, mask-padded)."""

    xyz: jnp.ndarray      # (B, N, 3)
    rgb: jnp.ndarray      # (B, N, 3)
    rot: jnp.ndarray      # (B, N, 4)
    scale: jnp.ndarray    # (B, N, 3)
    opacity: jnp.ndarray  # (B, N, 1)
    valid: jnp.ndarray    # (B, N) float {0, 1}

    @property
    def count(self) -> int:
        return self.xyz.shape[1]

    def concat(self, other: "FlatGaussians") -> "FlatGaussians":
        return FlatGaussians(
            xyz=jnp.concatenate([self.xyz, other.xyz], axis=1),
            rgb=jnp.concatenate([self.rgb, other.rgb], axis=1),
            rot=jnp.concatenate([self.rot, other.rot], axis=1),
            scale=jnp.concatenate([self.scale, other.scale], axis=1),
            opacity=jnp.concatenate([self.opacity, other.opacity], axis=1),
            valid=jnp.concatenate([self.valid, other.valid], axis=1),
        )
