"""Tile binning: duplicate -> sort by (tile, depth) -> per-tile ranges.

Static-shape equivalent of the CUDA rasterizer's duplicateWithKeys + global
radix sort + identifyTileRanges (SURVEY.md §2.3 N1): every Gaussian emits up
to `max_tiles_per_gaussian` (tile, depth, index) tuples (a static cap;
overflow is counted, never silent — SURVEY.md §7 hard part 2), one stable
multi-key `lax.sort` orders them, and searchsorted yields each tile's
segment.  Everything is integer/stop-grad: gradients flow through the
gathered float properties, not the permutation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
from jax import lax


class TileBins(NamedTuple):
    gauss_index: jnp.ndarray   # (P,) int32 index into the Gaussian arrays
    pair_slot: jnp.ndarray     # (P,) int32 unique pre-sort id g*K + k
    pair_valid: jnp.ndarray    # (P,) bool (False entries pad the tail)
    sorted_tile: jnp.ndarray   # (P,) int32 tile id per sorted pair
    tile_start: jnp.ndarray    # (T,) int32 first pair of each tile
    tile_count: jnp.ndarray    # (T,) int32 pairs in each tile
    num_dropped: jnp.ndarray   # () int32 pairs lost to the per-Gaussian cap


def bin_gaussians(mean2d: jnp.ndarray, depth: jnp.ndarray,
                  radius: jnp.ndarray, height: int, width: int,
                  tile: int = 16,
                  max_tiles_per_gaussian: int = 64) -> TileBins:
    """mean2d (N,2), depth (N,), radius (N,) -> sorted pair lists."""
    mean2d = lax.stop_gradient(mean2d)
    depth = lax.stop_gradient(depth)
    radius = lax.stop_gradient(radius)

    n = mean2d.shape[0]
    tiles_x = -(-width // tile)
    tiles_y = -(-height // tile)
    num_tiles = tiles_x * tiles_y

    # CUDA getRect lives in ONE place (pallas_kernel.tile_rects) so the
    # two backends can never drift on the clip algebra
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
        tile_rects

    x_min, y_min, span_x, total_capped, total = tile_rects(
        mean2d, radius, tiles_y, tiles_x, tile, max_tiles_per_gaussian)
    num_dropped = jnp.sum(total - total_capped)

    k = jnp.arange(max_tiles_per_gaussian, dtype=jnp.int32)  # (K,)
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
        expand_rect_offsets

    dx, dy = expand_rect_offsets(jnp.maximum(span_x, 1),
                                 max_tiles_per_gaussian)     # (N, K)
    pair_valid = k[None, :] < total_capped[:, None]          # (N, K)
    tile_id = (y_min[:, None] + dy) * tiles_x + (x_min[:, None] + dx)
    tile_id = jnp.where(pair_valid, tile_id, num_tiles)      # pad sentinel

    depth_k = jnp.broadcast_to(depth[:, None], tile_id.shape)

    tile_flat = tile_id.reshape(-1)
    depth_flat = depth_k.reshape(-1).astype(jnp.float32)
    # carry the UNIQUE pre-sort slot id (= g * K + k) instead of the
    # gaussian index: slot // K recovers the gaussian, and uniqueness lets
    # the backward segment-sum avoid TPU's pathological duplicate scatters
    slot_flat = jnp.arange(
        n * max_tiles_per_gaussian, dtype=jnp.int32)

    # single packed (tile | quantized depth) key — the same packing as the
    # pallas pair sort so both backends produce identical pair order
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
        pack_sort_key

    key_flat, qbits = pack_sort_key(tile_flat, depth_flat, num_tiles)
    key_s, slot_s = lax.sort((key_flat, slot_flat), num_keys=1,
                             is_stable=True)
    tile_s = key_s >> qbits
    # validity needs no sort operand: invalid pairs carry the sentinel id
    valid_s = tile_s < num_tiles

    tile_range = jnp.arange(num_tiles + 1, dtype=jnp.int32) * (1 << qbits)
    bounds = jnp.searchsorted(key_s, tile_range,
                              side="left").astype(jnp.int32)
    start, end = bounds[:-1], bounds[1:]

    return TileBins(gauss_index=slot_s // max_tiles_per_gaussian,
                    pair_slot=slot_s, pair_valid=valid_s,
                    sorted_tile=tile_s, tile_start=start,
                    tile_count=end - start, num_dropped=num_dropped)
