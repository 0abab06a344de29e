"""Multi-chip tile-sharded rendering (SURVEY.md §2.4 sequence-parallel
analogue; BASELINE config 5).

The reference's scale dimension is resolution / Gaussian count (2048^2
novel target, 2 x 1024^2 candidate Gaussians — lib/human_loader.py:409,
lib/GaussianRender.py:16-27); the TPU-native answer is to shard the NOVEL
IMAGE's tile grid over the mesh: every chip holds the (replicated,
fixed-size) Gaussian set its model forward produced, compacts the subset
whose screen rects overlap its band of tile rows, and runs the standard
fused sort + composite kernel on that band only.  Per-chip work (pair
sort length, kernel pairs, output pixels) shrinks ~linearly with the mesh
size; no ring exchange is needed because pixel-aligned Gaussian sets are
replicated-by-construction (each chip ran the same stereo forward), so
the only cross-chip data is the final image slice each chip owns.

Everything is a plain shard_map over an existing mesh axis — the same
('data',) mesh training uses can render 2K+ freeview frames between
steps.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from gps_gaussian_tpu.kernels.rasterizer import (RasterizeAux,
                                                 RasterizeConfig)
from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import (PROPW, TILE,
                                                               render_sorted,
                                                               stack_rows,
                                                               take_rows_unique)
from gps_gaussian_tpu.kernels.rasterizer.preprocess import project_gaussians
from gps_gaussian_tpu.utils.containers import FlatGaussians, NovelCamera


def _band_compact(stacked, y0, band_h: int, cap: int):
    """Keep Gaussians whose screen rect overlaps [y0, y0 + band_h) rows.

    Returns (stacked (cap, 16) band-local rows with col 1 shifted by -y0,
    num_dropped ()).  The same argsort compaction as the global fg_cap,
    keyed on band overlap."""
    from gps_gaussian_tpu.kernels.rasterizer.compaction import \
        live_first_order

    my = stacked[:, 1]
    radius = stacked[:, 10]
    keep = ((radius > 0.0) & (my + radius >= y0)
            & (my - radius < y0 + band_h))
    n = stacked.shape[0]
    idx, live, n_dropped = live_first_order(keep, cap)
    if idx is not None:
        stacked = take_rows_unique(stacked, idx.astype(jnp.float32))
    elif cap > n:
        stacked = jnp.pad(stacked, ((0, cap - n), (0, 0)))
    # shift to band-local pixel rows; kill rows outside the band
    stacked = jnp.concatenate(
        [stacked[:, 0:1], stacked[:, 1:2] - y0, stacked[:, 2:10],
         stacked[:, 10:11] * live[:, None], stacked[:, 11:PROPW]],
        axis=1)
    return stacked, n_dropped


def rasterize_tile_sharded(gaussians: FlatGaussians, camera: NovelCamera,
                           bg_color, cfg: RasterizeConfig, mesh: Mesh,
                           axis_name: str = "data"):
    """Render batch-1 Gaussians into one camera, tile rows sharded over
    `axis_name`.  Heights are padded up so every chip owns an equal band
    of 16px tile rows; the returned image is the full (1, H, W, 3) array
    sharded row-wise over the mesh (device_get assembles it on host).

    Returns (image, RasterizeAux) like `rasterize` (counters are
    mesh-summed).
    """
    assert gaussians.xyz.shape[0] == 1, (
        "tile-sharded rendering is per-frame (batch 1): the mesh is spent "
        "on the tile grid, not the batch — render frames sequentially")
    ndev = mesh.shape[axis_name]
    height, width = camera.height, camera.width
    tiles_y = -(-height // TILE)
    tiles_y_pad = -(-tiles_y // ndev) * ndev
    band_tiles = tiles_y_pad // ndev
    band_h = band_tiles * TILE

    bg = jnp.asarray(bg_color, jnp.float32)
    # per-BAND cap: bands see ~1/ndev of the set plus rect spill, so the
    # default sizes to 2x an even split (rounded to sublanes) — this is
    # what makes per-chip sort/kernel work shrink with the mesh.  An
    # explicit cfg.fg_cap overrides (counted, never silent, either way).
    n = gaussians.xyz.shape[1]
    if cfg.fg_cap is not None:
        cap = cfg.fg_cap
    else:
        cap = min(n, max(-(-2 * n // (ndev * 128)) * 128, 1024))

    def shard_fn(xyz, rot, scale, opacity, rgb, valid, view, proj,
                 tanfovx, tanfovy):
        idx = jax.lax.axis_index(axis_name)
        y0 = (idx * band_h).astype(jnp.float32)
        # project at the TRUE image size (pixel mapping depends on H/W);
        # only the tile grid is padded to ndev * band_tiles rows
        projd = project_gaussians(xyz[0], rot[0], scale[0], opacity[0],
                                  rgb[0], valid[0], view[0], proj[0],
                                  tanfovx[0], tanfovy[0], height, width)
        stacked = stack_rows(projd.mean2d, projd.conic, projd.opacity,
                             projd.color, projd.depth, projd.radius)
        stacked, band_dropped = _band_compact(stacked, y0, band_h, cap)
        interp = cfg.interpret or jax.default_backend() != "tpu"
        if cfg.span_schedule is not None:
            # per-BAND schedule: counts must sum to <= the band cap
            from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
                render_sorted_staircase
            img, trans, num_dropped, num_pair_dropped = \
                render_sorted_staircase(
                    stacked[None], band_h, width, cfg.span_schedule,
                    cfg.max_per_tile, cfg.pair_budget, bg,
                    interpret=interp, ellipse=cfg.ellipse_rects)
        else:
            img, trans, num_dropped, num_pair_dropped = render_sorted(
                stacked[None], band_h, width, cfg.max_tiles_per_gaussian,
                cfg.max_per_tile, cfg.pair_budget, bg, interpret=interp)
        aux = RasterizeAux(
            transmittance=trans,
            num_dropped=jax.lax.psum(num_dropped[0], axis_name)[None],
            num_fg_dropped=jax.lax.psum(band_dropped, axis_name)[None],
            num_pair_dropped=jax.lax.psum(num_pair_dropped[0],
                                          axis_name)[None])
        return img, aux

    rep = P()
    fn = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep,) * 10,
        out_specs=(P(None, axis_name), RasterizeAux(
            transmittance=P(None, axis_name),
            num_dropped=rep, num_fg_dropped=rep, num_pair_dropped=rep)),
        check_vma=False)
    img, aux = fn(gaussians.xyz, gaussians.rot, gaussians.scale,
                  gaussians.opacity, gaussians.rgb, gaussians.valid,
                  camera.view, camera.proj, camera.tanfovx, camera.tanfovy)
    img = img[:, :height]
    aux = aux._replace(transmittance=aux.transmittance[:, :height])
    return img, aux
