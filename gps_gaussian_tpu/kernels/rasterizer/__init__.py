"""Differentiable tile-binned Gaussian-splat rasterizer (public API).

TPU-native replacement for the reference's external
`diff_gaussian_rasterization` CUDA extension (SURVEY.md §2.3 N1).  The
pipeline is: EWA preprocess (jnp, AD) -> tile binning (static-shape sort,
integer) -> tiled alpha compositing (Pallas kernel on TPU, jnp fallback
elsewhere; custom VJP).  Inputs are fixed-size masked Gaussian sets — the
static-shape replacement for the reference's variable-length boolean-mask
gather (lib/GaussianRender.py:16-27).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gps_gaussian_tpu.kernels.rasterizer.binning import bin_gaussians
from gps_gaussian_tpu.kernels.rasterizer.composite_jnp import composite_tiles
from gps_gaussian_tpu.kernels.rasterizer.preprocess import project_gaussians
from gps_gaussian_tpu.kernels.rasterizer.reference import composite_reference
from gps_gaussian_tpu.utils.containers import FlatGaussians, NovelCamera


@dataclasses.dataclass(frozen=True)
class RasterizeConfig:
    """Static capacities (SURVEY.md §7 hard part 2: capped, never silent)."""

    tile: int = 16
    max_tiles_per_gaussian: int = 64   # per-Gaussian tile-duplication cap
    max_per_tile: int = 1024           # depth-sorted per-tile blend cap
    fg_cap: Optional[int] = None       # foreground compaction (None = off)
    pair_budget: Optional[int] = None  # cap on total sorted pairs (pallas)
    backend: str = "auto"              # 'jnp' | 'pallas' | 'auto'
    interpret: bool = False            # run the pallas kernel interpreted
    # span-staircase pair expansion (pallas backend): per-sample tuple of
    # (K_c, count_c) — rows span-sorted, rank classes get K_c duplicate
    # slots.  None = legacy uniform max_tiles_per_gaussian expansion.
    # Shrinks the pair sort to ~the live pair count (lax.sort cost is
    # superlinear in rows) while raising the top class K above the
    # uniform cap; overflow is counted in num_dropped as before.
    span_schedule: Optional[tuple] = None
    # bin with per-axis 3-sigma AABBs (staircase path only) instead of
    # the CUDA circumscribed circle: strictly fewer pairs; differences
    # bounded by alpha <= opacity * exp(-4.5) outside the 3-sigma ellipse
    ellipse_rects: bool = False

    def resolve_backend(self) -> str:
        if self.backend != "auto":
            return self.backend
        return "pallas" if jax.default_backend() == "tpu" else "jnp"


class RasterizeAux(NamedTuple):
    transmittance: jnp.ndarray    # (H, W, 1) final per-pixel T
    num_dropped: jnp.ndarray      # () pairs lost to the duplication cap
    num_fg_dropped: jnp.ndarray   # () gaussians lost to the fg_cap
    num_pair_dropped: jnp.ndarray # () pairs lost to max_per_tile/pair_budget


def compact_foreground(projd, cap: int):
    """Pack live (radius > 0) Gaussians into the first `cap` slots.

    Pixel-aligned Gaussian sets are ~80-90% masked background
    (SURVEY.md §6 Gaussian count); compacting before binning shrinks the
    global pair sort by the same factor.  argsort-based (a 2M-key sort
    is ~7 ms on TPU — scatters and vectorized binary search lose);
    gradients flow through the gathers.
    """
    from gps_gaussian_tpu.kernels.rasterizer.compaction import \
        live_first_order
    from gps_gaussian_tpu.kernels.rasterizer.preprocess import Projected

    n = projd.depth.shape[0]
    idx_map, slot_live, n_dropped = live_first_order(projd.radius > 0.0,
                                                     cap)
    if idx_map is None:
        # cap >= n: nothing can drop; pad in place if cap > n
        def pad(x):
            return jnp.pad(x, ((0, cap - n),) + ((0, 0),) * (x.ndim - 1))

        compacted = Projected(
            mean2d=pad(projd.mean2d), conic=pad(projd.conic),
            depth=pad(projd.depth),
            radius=pad(projd.radius) * slot_live,
            opacity=pad(projd.opacity), color=pad(projd.color))
        return compacted, n_dropped
    compacted = Projected(
        mean2d=projd.mean2d[idx_map],
        conic=projd.conic[idx_map],
        depth=projd.depth[idx_map],
        radius=projd.radius[idx_map] * slot_live,
        opacity=projd.opacity[idx_map],
        color=projd.color[idx_map])
    return compacted, n_dropped


def compact_gaussian_inputs(xyz, rot, scale, opacity, color, valid,
                            cap: int):
    """Compact RAW Gaussian inputs on the validity mask BEFORE projection.

    Validity (the foreground mask) is camera-independent, so compacting
    first shrinks the EWA preprocess AND the binning sort from N (all
    pixels, ~85% background) to `cap` rows.

    The move happens at SUPER-ROW granularity: 8 consecutive 16-float
    property rows pack one 128-lane row (a free row-major reshape), and a
    super-row is kept iff ANY of its 8 rows is valid.  This makes every
    DMA transaction 512 B — the round-3 row-exact gather at (2M, 16)
    measured 7.7 ms fwd + 12.9 ms bwd on v5e, while the identical data
    volume at (256k, 128) runs ~3 ms round trip (row gathers are
    transaction-bound, lane-tiled to 128 on TPU).  Foreground masks are
    silhouette runs, so 8-row granularity costs ~10% slack in `cap`
    (size fg_cap ~1.3x the expected foreground); dropped VALID rows are
    counted exactly, never silent.  Dead rows inside kept super-rows ride
    along with valid=0 and are culled by projection as before.

    Returns ((xyz, rot, scale, opacity(n,1), color, valid), n_dropped).
    `cap` and N must be multiples of 8.
    """
    from gps_gaussian_tpu.kernels.rasterizer.compaction import \
        live_first_order
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
        take_rows_unique

    n = xyz.shape[0]
    opacity = opacity.reshape(n, 1)
    valid_f = (valid.reshape(n) > 0.5).astype(jnp.float32)
    if cap >= n:
        # cap >= n: nothing can drop; pad in place if cap > n
        def pad(x):
            return jnp.pad(x, ((0, cap - n), (0, 0)))

        live = valid_f if cap == n else jnp.pad(valid_f, (0, cap - n))
        return (pad(xyz), pad(rot), pad(scale), pad(opacity), pad(color),
                live), jnp.zeros((), jnp.int32)
    if cap % 8:
        raise ValueError(
            f"compact_gaussian_inputs: cap={cap} must be a multiple of 8 "
            f"(super-row compaction packs 8 rows per 128-lane DMA row)")
    rows = jnp.concatenate(
        [xyz.astype(jnp.float32), rot.astype(jnp.float32),
         scale.astype(jnp.float32), opacity.astype(jnp.float32),
         color.astype(jnp.float32), valid_f[:, None],
         jnp.zeros((n, 1), jnp.float32)], axis=1)          # (N, 16)
    npad = (-n) % 8
    if npad:
        rows = jnp.pad(rows, ((0, npad), (0, 0)))
        valid_f = jnp.pad(valid_f, (0, npad))
    n8 = (n + npad) // 8
    rows128 = rows.reshape(n8, 128)
    live_super = valid_f.reshape(n8, 8).max(axis=1)

    idx_map, slot_live, _ = live_first_order(live_super > 0.5, cap // 8)
    # drops counted at ROW granularity: valid rows inside super-rows that
    # fell past the cap
    rank = jnp.cumsum(live_super) - live_super
    kept_super = live_super * (rank < cap // 8)
    rows_per_super = valid_f.reshape(n8, 8).sum(axis=1)
    n_dropped = (jnp.sum(valid_f)
                 - jnp.sum(rows_per_super * kept_super)).astype(jnp.int32)

    out128 = take_rows_unique(rows128, idx_map.astype(jnp.float32))
    out128 = out128 * slot_live[:, None]
    out = out128.reshape(cap, 16)
    return (out[:, 0:3], out[:, 3:7], out[:, 7:10], out[:, 10:11],
            out[:, 11:14], out[:, 14]), n_dropped


def _dispatch_render(stacked, height: int, width: int,
                     cfg: "RasterizeConfig", bg):
    """Pallas-path render entry: staircase expansion when configured."""
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import (
        render_sorted, render_sorted_staircase)

    if cfg.span_schedule is not None:
        return render_sorted_staircase(
            stacked, height, width, cfg.span_schedule, cfg.max_per_tile,
            cfg.pair_budget, bg, interpret=cfg.interpret,
            ellipse=cfg.ellipse_rects)
    return render_sorted(
        stacked, height, width, cfg.max_tiles_per_gaussian,
        cfg.max_per_tile, cfg.pair_budget, bg, interpret=cfg.interpret)


def _stack_rows(projd):
    """Row layout for the pallas path (depth/radius ride cols 9-10)."""
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
        stack_rows

    return stack_rows(projd.mean2d, projd.conic, projd.opacity,
                      projd.color, projd.depth, projd.radius)


def rasterize_single(xyz, rot, scale, opacity, color, valid,
                     view, proj, tanfovx, tanfovy,
                     height: int, width: int, bg_color,
                     cfg: RasterizeConfig = RasterizeConfig()):
    """Render one Gaussian set into one camera.  Shapes (N, ...) static.

    Returns (image (H, W, 3), RasterizeAux).
    """
    num_fg_dropped = jnp.zeros((), jnp.int32)

    backend = cfg.resolve_backend()
    if backend == "pallas":
        if cfg.fg_cap is not None:
            (xyz, rot, scale, opacity, color, valid), num_fg_dropped = \
                compact_gaussian_inputs(xyz, rot, scale, opacity, color,
                                        valid, cfg.fg_cap)
        projd = project_gaussians(xyz, rot, scale, opacity, color, valid,
                                  view, proj, tanfovx, tanfovy, height,
                                  width)
        stacked = _stack_rows(projd)
        img, trans, num_dropped, num_pair_dropped = _dispatch_render(
            stacked[None], height, width, cfg,
            jnp.asarray(bg_color, jnp.float32))
        return img[0], RasterizeAux(transmittance=trans[0],
                                    num_dropped=num_dropped[0],
                                    num_fg_dropped=num_fg_dropped,
                                    num_pair_dropped=num_pair_dropped[0])
    else:
        projd = project_gaussians(xyz, rot, scale, opacity, color, valid,
                                  view, proj, tanfovx, tanfovy, height,
                                  width)
        if cfg.fg_cap is not None:
            projd, num_fg_dropped = compact_foreground(projd, cfg.fg_cap)
        bins = bin_gaussians(projd.mean2d, projd.depth, projd.radius,
                             height, width, cfg.tile,
                             cfg.max_tiles_per_gaussian)
        idx = bins.gauss_index
        live_s = bins.pair_valid & (projd.radius[idx] > 0.0)
        img, trans = composite_tiles(
            projd.mean2d[idx], projd.conic[idx], projd.opacity[idx],
            projd.color[idx], live_s, bins.tile_start, bins.tile_count,
            height, width, jnp.asarray(bg_color, jnp.float32),
            tile=cfg.tile, max_per_tile=cfg.max_per_tile)
        num_pair_dropped = jnp.sum(
            jnp.maximum(bins.tile_count - cfg.max_per_tile, 0))
    return img, RasterizeAux(transmittance=trans,
                             num_dropped=bins.num_dropped,
                             num_fg_dropped=num_fg_dropped,
                             num_pair_dropped=num_pair_dropped)


def rasterize_reference_single(xyz, rot, scale, opacity, color, valid,
                               view, proj, tanfovx, tanfovy,
                               height: int, width: int, bg_color):
    """The exact slow oracle (per-pixel over all N)."""
    projd = project_gaussians(xyz, rot, scale, opacity, color, valid,
                              view, proj, tanfovx, tanfovy, height, width)
    return composite_reference(projd, jnp.asarray(bg_color, jnp.float32),
                               height, width)


def rasterize(gaussians: FlatGaussians, camera: NovelCamera, bg_color,
              cfg: RasterizeConfig = RasterizeConfig()):
    """Batched render: (B, N) Gaussians into (B,) cameras.

    Returns (images (B, H, W, 3), RasterizeAux with per-sample counters
    (B,) and transmittance (B, H, W, 1)) — the capacity-cap guarantee
    ("counted, never silent") surfaces here so trainers/eval can log drops.

    Capability of reference lib/GaussianRender.py pts2render, without the
    per-sample python loop.  On the pallas backend the whole batch is
    FUSED: per-sample preprocess/compaction vmaps (elementwise + batched
    sort), then one global pair sort and one kernel launch over a
    (B, ty, tx) grid — vmapping the sort pipeline instead costs ~60 ms per
    sample at 1024^2 (round-1 ROADMAP #9).
    """
    bg = jnp.asarray(bg_color, jnp.float32)
    h, w = camera.height, camera.width

    if cfg.resolve_backend() == "pallas":

        def prep(g: FlatGaussians, view, proj, tanfovx, tanfovy):
            xyz, rot, scale, opacity, rgb, valid = (
                g.xyz, g.rot, g.scale, g.opacity, g.rgb, g.valid)
            num_fg_dropped = jnp.zeros((), jnp.int32)
            if cfg.fg_cap is not None:
                (xyz, rot, scale, opacity, rgb, valid), num_fg_dropped = \
                    compact_gaussian_inputs(xyz, rot, scale, opacity, rgb,
                                            valid, cfg.fg_cap)
            projd = project_gaussians(
                xyz, rot, scale, opacity, rgb, valid,
                view, proj, tanfovx, tanfovy, h, w)
            return _stack_rows(projd), num_fg_dropped

        stacked, num_fg_dropped = jax.vmap(prep)(
            gaussians, camera.view, camera.proj, camera.tanfovx,
            camera.tanfovy)
        img, trans, num_dropped, num_pair_dropped = _dispatch_render(
            stacked, h, w, cfg, bg)
        return img, RasterizeAux(transmittance=trans,
                                 num_dropped=num_dropped,
                                 num_fg_dropped=num_fg_dropped,
                                 num_pair_dropped=num_pair_dropped)

    def one(g: FlatGaussians, view, proj, tanfovx, tanfovy):
        return rasterize_single(
            g.xyz, g.rot, g.scale, g.opacity, g.rgb, g.valid,
            view, proj, tanfovx, tanfovy, h, w, bg, cfg)

    return jax.vmap(one)(gaussians, camera.view, camera.proj,
                         camera.tanfovx, camera.tanfovy)
