"""In-memory synthetic fixtures (no disk IO) for smoke tests and benches."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from gps_gaussian_tpu.geometry import cameras
from gps_gaussian_tpu.utils.containers import (NovelCamera, NovelView,
                                               SourceView, StereoSample)


def fake_stereo_batch(batch: int = 1, res: int = 64,
                      novel_res: int | None = None, with_novel: bool = True,
                      seed: int = 0) -> StereoSample:
    """A geometrically-plausible random batch with full camera tensors."""
    rng = np.random.default_rng(seed)
    novel_res = novel_res or res

    def view(offset: float) -> SourceView:
        K = np.array([[0.8 * res, 0, res / 2 + offset],
                      [0, 0.8 * res, res / 2],
                      [0, 0, 1]], np.float32)
        E = np.eye(3, 4, dtype=np.float32)
        E[0, 3] = offset * 0.01
        E[2, 3] = 2.0
        img = rng.uniform(-1, 1, (batch, res, res, 3)).astype(np.float32)
        mask = (rng.uniform(size=(batch, res, res, 1)) > 0.3).astype(
            np.float32)
        return SourceView(
            img=jnp.asarray(img * mask), mask=jnp.asarray(mask),
            intr=jnp.asarray(np.tile(K, (batch, 1, 1))),
            ref_intr=jnp.asarray(np.tile(K, (batch, 1, 1))),
            extr=jnp.asarray(np.tile(E, (batch, 1, 1))),
            tf_x=jnp.full((batch,), -40.0 if offset == 0 else 40.0),
            flow=jnp.asarray(
                rng.uniform(0, 8, (batch, res, res, 1)).astype(np.float32)),
            valid=jnp.asarray(mask))

    novel = None
    if with_novel:
        K = np.array([[0.8 * novel_res, 0, novel_res / 2],
                      [0, 0.8 * novel_res, novel_res / 2],
                      [0, 0, 1]], np.float32)
        E = np.eye(3, 4, dtype=np.float32)
        E[2, 3] = 2.0
        cam = cameras.camera_from_intr_extr(K, E, novel_res, novel_res)
        camera = NovelCamera(
            view=jnp.asarray(np.tile(cam["view"], (batch, 1, 1))),
            proj=jnp.asarray(np.tile(cam["proj"], (batch, 1, 1))),
            cam_center=jnp.asarray(np.tile(cam["cam_center"], (batch, 1))),
            tanfovx=jnp.full((batch,), cam["tanfovx"]),
            tanfovy=jnp.full((batch,), cam["tanfovy"]),
            height=novel_res, width=novel_res)
        novel = NovelView(
            camera=camera,
            img=jnp.asarray(rng.uniform(
                0, 1, (batch, novel_res, novel_res, 3)).astype(np.float32)),
            intr=jnp.asarray(np.tile(K, (batch, 1, 1))),
            extr=jnp.asarray(np.tile(E, (batch, 1, 1))))

    return StereoSample(lmain=view(0.0), rmain=view(3.0), novel=novel)
