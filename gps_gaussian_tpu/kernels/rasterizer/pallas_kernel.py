"""Pallas TPU kernels for tiled Gaussian alpha compositing (fwd + bwd).

Replaces the per-tile compositing loops of the reference's external CUDA
rasterizer (SURVEY.md §2.3 N1) with a TPU-native formulation:

* per-pair properties are carried THROUGH the binning sort as extra
  `lax.sort` operands (measured nearly free on TPU) instead of being
  gathered afterwards — the round-1 row-gather pack stage (44 ms fwd /
  ~90 ms bwd at production sizes) disappears entirely;
* sorted pairs are laid out chunk-major as (num_chunks, 16, 128): every
  streamed DMA is a contiguous 8 KB (or 32 KB batched) block, no strided
  slices and no lane-alignment games;
* tile segments are NOT padded to chunk boundaries; the kernel masks the
  head/tail of the first/last chunk by pair position.  Empty tiles are
  skipped outright;
* front-to-back transmittance is an exclusive cumulative PRODUCT of
  (1 - alpha) along the pair axis — a 7-step Hillis-Steele lane scan on
  the VPU in f32 (fully parallel over pixels; no sequential walk, no
  atomics, no transcendentals, and the same repeated-multiply semantics
  as the CUDA walk).  Because accumulated transmittance is monotone
  non-increasing, the "first violation" test needs no cumulative count
  (violations form a suffix: a pair blends iff it does not itself cross
  T_EPS), the per-chunk carry is a masked max-reduce, and once EVERY
  pixel of a tile is done the step-level while loop exits early — the
  CUDA kernel's all-threads-done exit;
* the backward kernel re-walks the same chunks computing analytic gradients
  (suffix contributions via inclusive cumsums) and writes per-PAIR gradient
  rows to a chunk-major buffer.  Chunks shared between adjacent tile
  segments are merged read-modify-write: the TPU grid is sequential, so the
  one boundary chunk per tile can be read back, accumulated, and rewritten
  without races;
* the backward's pair gradients return to per-Gaussian layout by a second
  `lax.sort` keyed on the unique pre-sort slot id (a full permutation, so
  sorting by slot IS the inverse permutation) followed by a dense
  reshape-sum over the duplication axis — no scatters anywhere;
* the binning sort uses ONE packed i32 key — tile id in the high bits,
  quantized depth below (pack_sort_key) — and the whole BATCH goes
  through one sort and one (B, ty, tx) kernel launch, tile ids offset by
  b * tiles per sample.

Only the pallas composite carries a custom VJP; the pair sort carries its
own custom VJP (the unsort described above).

Property rows of the chunk-major array:
  0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
  6..8 rgb, 9..15 zero padding.  Gradient rows mirror slots 0..8.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gps_gaussian_tpu.kernels.rasterizer.reference import (ALPHA_MAX,
                                                           ALPHA_MIN, T_EPS)

CHUNK = 128          # pairs per compute chunk (= lane width)
DCH = 4              # chunks per DMA step (batched streaming)
STEP = CHUNK * DCH   # pairs per DMA step
PROPW = 16           # packed property rows
NPROP = 9            # live property rows (mx my ca cb cc op r g b)
TILE = 16            # pixels per tile side
PIX = TILE * TILE    # 256 pixel sublanes
OUTC = 4             # output channels per tile pixel: r, g, b, transmittance


@jax.custom_vjp
def take_rows_unique(stacked, idx_f):
    """Row gather with UNIQUE indices whose backward is also a gather.

    AD would emit a row scatter for the backward (measured 45 ms for
    400k x 16 rows into 2M on TPU, even with unique indices); inverting
    the permutation with one scalar int scatter turns it into a 17 ms
    row gather instead.  idx travels as f32 (exact below 2^24).
    """
    n = stacked.shape[0]
    return stacked[jnp.clip(idx_f.astype(jnp.int32), 0, n - 1)]


def _take_rows_fwd(stacked, idx_f):
    return take_rows_unique(stacked, idx_f), (stacked.shape[0], idx_f)


def _take_rows_bwd(saved, g):
    n, idx_f = saved
    cap = idx_f.shape[0]
    idx = jnp.clip(idx_f.astype(jnp.int32), 0, n - 1)
    inv = jnp.full((n,), cap, jnp.int32).at[idx].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop", unique_indices=True)
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    return g_pad[inv], jnp.zeros_like(idx_f)


take_rows_unique.defvjp(_take_rows_fwd, _take_rows_bwd)


def stack_rows(mean2d, conic, opacity, color, depth, radius):
    """Per-Gaussian properties as contiguous (N, 16) rows.

    Columns 0..8 are the kernel's property rows; 9 = depth and 10 = radius
    feed the binning sort (never the kernel); 11..15 pad to a sublane
    multiple."""
    n = mean2d.shape[0]
    return jnp.concatenate([
        mean2d, conic, opacity.reshape(n, 1), color,
        depth.reshape(n, 1), radius.reshape(n, 1),
        jnp.zeros((n, PROPW - 11), jnp.float32)], axis=1)


# ---------------------------------------------------------------------------
# pair sort: duplicate into tiles, sort by (tile, depth) carrying properties
# ---------------------------------------------------------------------------


def tile_rects(mean2d, radius, tiles_y: int, tiles_x: int, tile: int,
               max_tiles: int):
    """CUDA getRect: exclusive-max tile rectangle per Gaussian, clamped.

    Returns (x_min, y_min, span_x, total_capped, total_uncapped) —
    total_capped is the per-Gaussian live duplicate count clamped to
    max_tiles (0 when culled); callers count duplication-cap drops as
    total_uncapped - total_capped (never silent — SURVEY.md §7 hard
    part 2).
    """
    mean2d = lax.stop_gradient(mean2d)
    radius = lax.stop_gradient(radius)
    x_min = jnp.clip(jnp.floor((mean2d[:, 0] - radius) / tile), 0,
                     tiles_x).astype(jnp.int32)
    x_max = jnp.clip(jnp.floor((mean2d[:, 0] + radius + tile - 1) / tile),
                     0, tiles_x).astype(jnp.int32)
    y_min = jnp.clip(jnp.floor((mean2d[:, 1] - radius) / tile), 0,
                     tiles_y).astype(jnp.int32)
    y_max = jnp.clip(jnp.floor((mean2d[:, 1] + radius + tile - 1) / tile),
                     0, tiles_y).astype(jnp.int32)
    span_x = x_max - x_min
    span_y = y_max - y_min
    total = jnp.where(radius > 0.0, span_x * span_y, 0)
    total_capped = jnp.minimum(total, max_tiles)
    return x_min, y_min, span_x, total_capped, total


def expand_rect_offsets(span_x, max_tiles: int):
    """(dx, dy) tile offsets for duplicate k = dy * span_x + dx, WITHOUT
    integer div/mod.

    `k // span` and `k % span` over N*K elements are software-emulated on
    TPU (no integer divide hardware) and cost ~10 ms at 2.8M pairs; f32
    division IS hardware, and floor(k / span) computed in f32 is exact
    here: k <= K-1 <= 63 and span <= tiles_x <= a few hundred are both
    exactly representable, the relative division error (~6e-8 * q) is far
    below the 1/span distance from any non-multiple quotient to the next
    integer, and exact multiples divide exactly.  span_x must be >= 1
    (callers clamp)."""
    assert max_tiles <= 4096, "f32 floor-div exactness bound"
    k = jnp.arange(max_tiles, dtype=jnp.int32)[None, :]
    span = span_x[:, None]
    dy = jnp.floor(k.astype(jnp.float32)
                   / span.astype(jnp.float32)).astype(jnp.int32)
    dx = k - dy * span
    return dx, dy


def ellipse_radii(conic, radius):
    """Per-axis 3-sigma half-extents from the conic (ellipse AABB).

    The conic is the inverse 2D covariance (a, b, c) = (C, -B, A)/det, so
    cov_xx = conic_c / det' and cov_yy = conic_a / det' with
    det' = conic_a * conic_c - conic_b^2.  The 3-sigma ellipse's AABB has
    half-extents exactly 3*sqrt(cov_xx) x 3*sqrt(cov_yy) — always inside
    the circumscribed circle the CUDA rasterizer uses (3*sqrt(lambda_max),
    preprocess.py radius), so per-axis rects bin strictly FEWER tiles.
    Pairs culled relative to circle rects contribute alpha at most
    opacity * exp(-4.5) ~= 0.011 to pixels outside the 3-sigma ellipse —
    the quality-neutral cut the reference makes INSIDE the ellipse via its
    1/255 alpha threshold.  Culled rows (radius 0) return (0, 0)."""
    ca, cb, cc = conic[:, 0], conic[:, 1], conic[:, 2]
    det = jnp.maximum(ca * cc - cb * cb, 1e-12)
    live = radius > 0.0
    rx = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(cc / det, 0.0)))
    ry = jnp.ceil(3.0 * jnp.sqrt(jnp.maximum(ca / det, 0.0)))
    rx = jnp.where(live, jnp.minimum(rx, radius), 0.0)
    ry = jnp.where(live, jnp.minimum(ry, radius), 0.0)
    return rx, ry


def tile_rects_xy(mean2d, rx, ry, tiles_y: int, tiles_x: int, tile: int,
                  max_tiles: int):
    """tile_rects with independent x/y half-extents (ellipse AABB)."""
    mean2d = lax.stop_gradient(mean2d)
    x_min = jnp.clip(jnp.floor((mean2d[:, 0] - rx) / tile), 0,
                     tiles_x).astype(jnp.int32)
    x_max = jnp.clip(jnp.floor((mean2d[:, 0] + rx + tile - 1) / tile),
                     0, tiles_x).astype(jnp.int32)
    y_min = jnp.clip(jnp.floor((mean2d[:, 1] - ry) / tile), 0,
                     tiles_y).astype(jnp.int32)
    y_max = jnp.clip(jnp.floor((mean2d[:, 1] + ry + tile - 1) / tile),
                     0, tiles_y).astype(jnp.int32)
    span_x = x_max - x_min
    span_y = y_max - y_min
    total = jnp.where((rx > 0.0) & (ry > 0.0), span_x * span_y, 0)
    total_capped = jnp.minimum(total, max_tiles)
    return x_min, y_min, span_x, total_capped, total


def pack_sort_key(tile_i, depth, total_tiles: int):
    """(tile, depth) packed into ONE i32 sort key.

    The CUDA rasterizer radix-sorts 64-bit (tile << 32 | float-bits) keys;
    on TPU a single 32-bit key halves the comparator work and drops the
    depth operand from the sort entirely.  Depth is quantized to the bits
    left under the tile id (>= 13 at 1024^2, still sub-micron bins for
    metre-scale scenes); ties resolve by the stable sort's slot order.
    Dead pairs carry the sentinel tile and sort last unchanged.

    Depth resolution SHRINKS with batch * tiles (the fused batch offsets
    tile ids by b * tiles): fewer qbits coarsen intra-tile blend order
    for near-equal depths.  12 bits keeps bins sub-mm for metre-scale
    scenes; an oversized batch * tile product fails loudly here instead
    of silently degrading ordering.
    """
    qbits = 31 - int(total_tiles + 1).bit_length()
    if qbits < 12:
        raise ValueError(
            f"pack_sort_key: only {qbits} depth bits left under "
            f"{total_tiles} tile ids (batch * tiles too large for the "
            f"packed i32 sort key); shrink the batch or render in "
            f"tile-sharded bands (kernels/rasterizer/sharded.py)")
    live = tile_i < total_tiles
    dmin = jnp.min(jnp.where(live, depth, jnp.inf))
    dmin = jnp.where(jnp.isfinite(dmin), dmin, 0.0)
    dmax = jnp.max(jnp.where(live, depth, -jnp.inf))
    dmax = jnp.where(jnp.isfinite(dmax), dmax, 1.0)
    # dead pairs may carry NaN/garbage depth (culled gaussians): mask
    # BEFORE quantizing or their keys corrupt the sort order
    dd = jnp.where(live, depth, dmin)
    scale = (2.0 ** qbits - 1.0) / jnp.maximum(dmax - dmin, 1e-20)
    # clamp in INTEGERS: the float bound 2^qbits - 1 is not representable
    # in f32 for qbits > 24, and a rounded-up clip bound would spill the
    # max-depth pair into the NEXT tile's key range
    qd = jnp.clip(jnp.maximum((dd - dmin) * scale, 0.0).astype(jnp.int32),
                  0, (1 << qbits) - 1)
    return tile_i * (1 << qbits) + qd, qbits


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _pair_sort(stacked, tile_f, depth, K: int, p_chunks: int,
               num_tiles: int, max_per_tile: int):
    """Duplicate + sort pairs, returning chunk-major kernel input.

    stacked: (C, 16) per-Gaussian rows; tile_f: (C*K,) f32 tile id per
    duplicate (sentinel num_tiles for dead); depth: (C*K,) f32 sort key.

    Returns (props3d (p_chunks+DCH, 16, 128), start (T,) i32,
    count (T,) i32).  start/count stay INTEGER: at hr settings
    batch * pair_budget exceeds 2^24 and an f32 carrier would round
    segment boundaries to even integers, compositing neighbor tiles'
    pairs (int outputs get float0 cotangents, discarded in the bwd).

    The backward un-sorts pair gradients with a second sort keyed on the
    unique pre-sort slot id (a full permutation of [0, C*K)), then
    reduces the K duplicates per Gaussian with a dense reshape-sum.
    """
    # primal (not-being-differentiated) path: the slot operand exists only
    # for the backward's unsort, so inference sorts one operand fewer
    out, _ = _pair_sort_impl(stacked, tile_f, depth, K, p_chunks,
                             num_tiles, max_per_tile, with_slot=False)
    return out


def _pair_sort_impl(stacked, tile_f, depth, K, p_chunks, num_tiles,
                    max_per_tile, with_slot=True):
    n = stacked.shape[0]
    nK = n * K
    P = p_chunks * CHUNK
    tile_i = lax.stop_gradient(tile_f).astype(jnp.int32)
    depth = lax.stop_gradient(depth)
    key, qbits = pack_sort_key(tile_i, depth, num_tiles)
    ops = tuple(jnp.broadcast_to(stacked[:, c:c + 1], (n, K)).reshape(-1)
                for c in range(NPROP))
    if with_slot:
        slot = jnp.arange(nK, dtype=jnp.int32)
        sorted_ = lax.sort((key, slot) + ops, num_keys=1, is_stable=True)
        key_s, slot_s = sorted_[0], sorted_[1]
        props_s = sorted_[2:]
    else:
        sorted_ = lax.sort((key,) + ops, num_keys=1, is_stable=True)
        key_s, slot_s = sorted_[0], None
        props_s = sorted_[1:]

    # tile boundaries directly on the packed keys: tile t's segment is
    # [searchsorted(t << qbits), searchsorted((t+1) << qbits))
    bounds = jnp.searchsorted(
        key_s, jnp.arange(num_tiles + 1, dtype=jnp.int32) * (1 << qbits),
        side="left").astype(jnp.int32)
    start = jnp.minimum(bounds[:-1], P)
    end = jnp.minimum(bounds[1:], P)
    count = jnp.minimum(end - start, max_per_tile)

    cols = []
    for p in props_s:
        p = p[:P] if nK >= P else jnp.pad(p, (0, P - nK))
        cols.append(p.reshape(p_chunks, CHUNK))
    cols += [jnp.zeros((p_chunks, CHUNK), jnp.float32)] * (PROPW - NPROP)
    props3d = jnp.stack(cols, axis=1)               # (p_chunks, 16, 128)
    props3d = jnp.pad(props3d, ((0, DCH), (0, 0), (0, 0)))  # DMA tail margin
    out = (props3d, start, count)
    return out, slot_s


def _pair_sort_fwd(stacked, tile_f, depth, K, p_chunks, num_tiles,
                   max_per_tile):
    out, slot_s = _pair_sort_impl(stacked, tile_f, depth, K, p_chunks,
                                  num_tiles, max_per_tile)
    return out, (slot_s, stacked.shape[0], tile_f, depth)


def _pair_sort_bwd(K, p_chunks, num_tiles, max_per_tile, saved, cots):
    """Un-sort pair gradients by re-sorting on the unique slot id.

    Measured on v5e (round 3, /tmp-style micro-bench at nK = 2.8M,
    P = 1.57M): this 10-operand sort + dense reshape-sum runs ~5.4 ms;
    the "obvious" alternatives lose badly — scatter-inverse-permutation
    + row gather = 22.7 ms, 2-op sort + row gather = 22.8 ms (the
    (nchunks, 16, 128) -> (P, 16) transpose alone is 13 ms and a 2.8M
    random row gather 23 ms, while carrying extra f32 operands through
    lax.sort is nearly free).  Sorts are cheap on TPU; gathers are not."""
    slot_s, n, tile_f, depth = saved
    g_props3d, _, _ = cots
    nK = n * K
    P = p_chunks * CHUNK
    g3 = g_props3d[:p_chunks]                       # strip the DMA margin
    gcols = []
    for r in range(NPROP):
        gc = g3[:, r, :].reshape(P)
        gc = gc[:nK] if P >= nK else jnp.pad(gc, (0, nK - P))
        gcols.append(gc)
    # sorting by the unique slot id IS the inverse permutation; slot_s is
    # a permutation of [0, nK) so is_stable=False is bitwise-identical
    # and spares XLA's StableSortExpander from adding a hidden iota
    # tiebreaker operand (one full extra pass at 2.8M pairs)
    unsorted = lax.sort((slot_s,) + tuple(gcols), num_keys=1,
                        is_stable=False)
    g_stack = [o.reshape(n, K).sum(axis=1) for o in unsorted[1:]]
    g_stacked = jnp.stack(
        g_stack + [jnp.zeros((n,), jnp.float32)] * (PROPW - NPROP), axis=1)
    return g_stacked, jnp.zeros_like(tile_f), jnp.zeros_like(depth)


_pair_sort.defvjp(_pair_sort_fwd, _pair_sort_bwd)


# ---------------------------------------------------------------------------
# span-staircase pair expansion: sort rows by tile-span, give big-span rows
# more duplicate slots
# ---------------------------------------------------------------------------
#
# The legacy path expands EVERY row to max_tiles_per_gaussian duplicates, so
# the pair sort runs over the static fg_cap * K rows (2.8M at the 1024^2
# bench) even though only ~1.5M pairs are live — and lax.sort cost is
# SUPERLINEAR in rows on v5e (measured: 10 operands at 2.8M/2.1M/1.6M/1.0M =
# 22.1/12.0/7.8/4.2 ms).  The staircase instead sorts each sample's rows by
# DESCENDING tile span (one carried 13-operand sort at fg_cap rows, ~2.5 ms)
# and then hands out duplicate capacity by RANK: the first count_0 rows get
# K_0 slots, the next count_1 get K_1, ... (static per-sample schedule).
# Rows whose span exceeds their class capacity, and rows past the schedule,
# drop the excess — counted in num_dropped exactly like the legacy K cap.
# This cuts the pair-sort length to roughly the live pair count while
# RAISING the top class's K above the legacy uniform cap (fewer drops).


@jax.custom_vjp
def sort_rows_by_key(key, cols):
    """Carried row sort: cols (tuple of (N,) f32) reordered by i32 `key`.

    `key` must be a PERMUTATION-UNIQUE packing (caller packs rank bits
    above a slot id), so is_stable=False is deterministic.  The backward
    un-sorts cotangents with a second sort keyed on the saved slot order —
    the same sorts-are-cheap/gathers-are-not tradeoff as _pair_sort.
    """
    out, _ = _sort_rows_impl(key, cols)
    return out


def _sort_rows_impl(key, cols):
    n = key.shape[0]
    slot = jnp.arange(n, dtype=jnp.int32)
    sorted_ = lax.sort((key, slot) + tuple(cols), num_keys=1,
                       is_stable=False)
    return tuple(sorted_[2:]), sorted_[1]


def _sort_rows_fwd(key, cols):
    out, slot_s = _sort_rows_impl(key, cols)
    return out, (slot_s, key.shape[0])


def _sort_rows_bwd(saved, g):
    import numpy as np

    slot_s, n = saved
    gz = tuple(jnp.zeros((n,), jnp.float32) if gi is None else gi
               for gi in g)
    unsorted = lax.sort((slot_s,) + gz, num_keys=1, is_stable=False)
    return (np.zeros((n,), dtype=jax.dtypes.float0), tuple(unsorted[1:]))


sort_rows_by_key.defvjp(_sort_rows_fwd, _sort_rows_bwd)


def _pack_chunks(props_s, nK, P, p_chunks):
    """Sorted per-pair columns -> chunk-major (p_chunks + DCH, 16, 128)."""
    cols = []
    for p in props_s:
        p = p[:P] if nK >= P else jnp.pad(p, (0, P - nK))
        cols.append(p.reshape(p_chunks, CHUNK))
    cols += [jnp.zeros((p_chunks, CHUNK), jnp.float32)] * (PROPW - NPROP)
    props3d = jnp.stack(cols, axis=1)               # (p_chunks, 16, 128)
    return jnp.pad(props3d, ((0, DCH), (0, 0), (0, 0)))  # DMA tail margin


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _pair_sort_pre(props9, tile_f, depth, p_chunks: int, num_tiles: int,
                   max_per_tile: int):
    """_pair_sort for PRE-BROADCAST pair columns (staircase path).

    props9: tuple of 9 (P_in,) f32 per-pair property columns, already
    expanded per duplicate by the caller; tile_f/depth: (P_in,) sort keys.
    Returns (props3d, start, count) exactly like _pair_sort; the backward
    un-sorts pair gradients by the unique pair slot and returns them in
    caller order — the caller's broadcast structure (plain AD) reduces
    duplicates back to rows.
    """
    out, _ = _pair_sort_pre_impl(props9, tile_f, depth, p_chunks,
                                 num_tiles, max_per_tile, with_slot=False)
    return out


def _pair_sort_pre_impl(props9, tile_f, depth, p_chunks, num_tiles,
                        max_per_tile, with_slot=True):
    nK = tile_f.shape[0]
    P = p_chunks * CHUNK
    tile_i = lax.stop_gradient(tile_f).astype(jnp.int32)
    depth = lax.stop_gradient(depth)
    key, qbits = pack_sort_key(tile_i, depth, num_tiles)
    # is_stable=False: ties in the packed (tile, qdepth) key are pairs in
    # the same sub-mm depth bin, whose blend order is arbitrary in the
    # reference too (CUDA radix ties resolve by duplication order).  The
    # sort network is still deterministic, and the backward's unsort keys
    # on the carried UNIQUE slot, so gradients always match the order
    # actually produced.  Stability would cost one hidden iota operand
    # pass (XLA StableSortExpander) over the full pair length.
    # ASSUMPTION (pinned by tests/test_staircase.py tie-heavy case): the
    # train path carries one extra slot operand vs the inference primal;
    # XLA's unstable tie resolution must not depend on operand count or
    # train/eval renders diverge bitwise on shared (tile, qdepth) bins.
    if with_slot:
        slot = jnp.arange(nK, dtype=jnp.int32)
        sorted_ = lax.sort((key, slot) + tuple(props9), num_keys=1,
                           is_stable=False)
        key_s, slot_s, props_s = sorted_[0], sorted_[1], sorted_[2:]
    else:
        sorted_ = lax.sort((key,) + tuple(props9), num_keys=1,
                           is_stable=False)
        key_s, slot_s, props_s = sorted_[0], None, sorted_[1:]

    bounds = jnp.searchsorted(
        key_s, jnp.arange(num_tiles + 1, dtype=jnp.int32) * (1 << qbits),
        side="left").astype(jnp.int32)
    start = jnp.minimum(bounds[:-1], P)
    end = jnp.minimum(bounds[1:], P)
    count = jnp.minimum(end - start, max_per_tile)
    return (_pack_chunks(props_s, nK, P, p_chunks), start, count), slot_s


def _pair_sort_pre_fwd(props9, tile_f, depth, p_chunks, num_tiles,
                       max_per_tile):
    out, slot_s = _pair_sort_pre_impl(props9, tile_f, depth, p_chunks,
                                      num_tiles, max_per_tile)
    return out, (slot_s, tile_f, depth)


def _pair_sort_pre_bwd(p_chunks, num_tiles, max_per_tile, saved, cots):
    slot_s, tile_f, depth = saved
    g_props3d, _, _ = cots
    nK = tile_f.shape[0]
    P = p_chunks * CHUNK
    g3 = g_props3d[:p_chunks]
    gcols = []
    for r in range(NPROP):
        gc = g3[:, r, :].reshape(P)
        gc = gc[:nK] if P >= nK else jnp.pad(gc, (0, nK - P))
        gcols.append(gc)
    unsorted = lax.sort((slot_s,) + tuple(gcols), num_keys=1,
                        is_stable=False)
    return (tuple(unsorted[1:]), jnp.zeros_like(tile_f),
            jnp.zeros_like(depth))


_pair_sort_pre.defvjp(_pair_sort_pre_fwd, _pair_sort_pre_bwd)


def validate_span_schedule(span_schedule, fg_cap: int, batch: int = 1):
    """Static-config checks for the staircase path, callable standalone.

    Raises ValueError on any violation.  Exposed so benches/tests can
    vet a RasterizeConfig's literals WITHOUT building the scene (a red
    driver bench from a pure-literal config error — BENCH_r04 — should
    be impossible; tests/test_bench_config.py runs bench.py's exact
    config through this).
    """
    if batch * (1 << 28) > 2 ** 31:
        raise ValueError("staircase span key packs b|span|slot into i32: "
                         f"batch {batch} > 8 unsupported")
    if fg_cap > 1 << 22:
        raise ValueError(f"staircase span key: fg_cap {fg_cap} > 2^22")
    counts = [c for _, c in span_schedule]
    ks = [k for k, _ in span_schedule]
    if sum(counts) > fg_cap:
        raise ValueError(f"span_schedule covers {sum(counts)} rows > "
                         f"fg_cap {fg_cap}")
    if any(k > 63 for k in ks):
        raise ValueError("span_schedule K > 63 (span key uses 6 bits)")


def render_sorted_staircase(stacked, height: int, width: int,
                            span_schedule, max_per_tile: int, pair_budget,
                            bg_color, interpret: bool = False,
                            ellipse: bool = False):
    """render_sorted with the span-staircase pair expansion.

    span_schedule: per-sample tuple of (K_c, count_c) pairs, K descending;
    sample rows are span-sorted and rank r gets the K of its class.  Rows
    past sum(count_c) contribute no pairs (their spans are counted as
    drops — with fg compaction ahead of this they are dead rows).
    ellipse=True bins with per-axis 3-sigma AABBs (ellipse_radii) instead
    of the CUDA circumscribed circle: strictly fewer pairs, alpha <= 0.011
    difference confined outside the 3-sigma ellipse.
    """
    batch, n = stacked.shape[0], stacked.shape[1]
    tiles_y, tiles_x = _grids(height, width)
    num_tiles = tiles_y * tiles_x
    validate_span_schedule(span_schedule, n, batch)

    flat = stacked.reshape(batch * n, PROPW)
    mean2d = lax.stop_gradient(flat[:, 0:2])
    radius = lax.stop_gradient(flat[:, 10])

    def rects(m2, rad, conic, k_cap):
        if ellipse:
            rx, ry = ellipse_radii(lax.stop_gradient(conic), rad)
            return tile_rects_xy(m2, rx, ry, tiles_y, tiles_x, TILE, k_cap)
        return tile_rects(m2, rad, tiles_y, tiles_x, TILE, k_cap)

    # span of every row (uncapped rect area, clamped to the 6-bit field)
    _, _, _, _, total_unc = rects(mean2d, radius, flat[:, 2:5], 63)
    span6 = jnp.clip(total_unc, 0, 63)

    # per-sample descending-span key: b (3 bits) | 63-span (6) | slot (22)
    slot_within = jnp.tile(jnp.arange(n, dtype=jnp.int32), batch)
    b_idx = jnp.repeat(jnp.arange(batch, dtype=jnp.int32), n)
    key = (b_idx << 28) + ((63 - span6) << 22) + slot_within

    cols = tuple(flat[:, c] for c in range(11))      # 9 props + depth + rad
    cols_s = sort_rows_by_key(key, cols)
    depth_s = lax.stop_gradient(cols_s[9])
    radius_s = lax.stop_gradient(cols_s[10])

    # per-class expansion, vectorized over the batch via (B, n) reshape
    def cls_view(x, off, cnt):
        return x.reshape(batch, n)[:, off:off + cnt]

    pair_props = [[] for _ in range(NPROP)]
    pair_tile, pair_depth = [], []
    num_dropped = jnp.zeros((batch,), jnp.int32)
    total_capped_sum = jnp.zeros((batch,), jnp.int32)
    off = 0
    for k_c, cnt in span_schedule:
        m2 = jnp.stack([cls_view(cols_s[0], off, cnt),
                        cls_view(cols_s[1], off, cnt)],
                       axis=-1).reshape(batch * cnt, 2)
        rad = cls_view(radius_s, off, cnt).reshape(batch * cnt)
        con = lax.stop_gradient(jnp.stack(
            [cls_view(cols_s[2], off, cnt), cls_view(cols_s[3], off, cnt),
             cls_view(cols_s[4], off, cnt)],
            axis=-1).reshape(batch * cnt, 3))
        x_min, y_min, span_x, tc, tu = rects(
            lax.stop_gradient(m2), rad, con, k_c)
        num_dropped += jnp.sum((tu - tc).reshape(batch, cnt), axis=1)
        total_capped_sum += jnp.sum(tc.reshape(batch, cnt), axis=1)

        dx, dy = expand_rect_offsets(jnp.maximum(span_x, 1), k_c)
        kk = jnp.arange(k_c, dtype=jnp.int32)
        live = kk[None, :] < tc[:, None]
        tid = (y_min[:, None] + dy) * tiles_x + (x_min[:, None] + dx)
        boff = jnp.repeat(
            jnp.arange(batch, dtype=jnp.int32) * num_tiles, cnt)
        tid = tid + boff[:, None]
        tid = jnp.where(live, tid, batch * num_tiles)
        pair_tile.append(tid.reshape(-1))
        pair_depth.append(jnp.broadcast_to(
            cls_view(depth_s, off, cnt).reshape(-1, 1),
            (batch * cnt, k_c)).reshape(-1))
        for p in range(NPROP):
            pair_props[p].append(jnp.broadcast_to(
                cls_view(cols_s[p], off, cnt).reshape(-1, 1),
                (batch * cnt, k_c)).reshape(-1))
        off += cnt

    # rows past the schedule: their (uncapped) spans are dropped pairs
    if off < n:
        tail_m2 = jnp.stack([cls_view(cols_s[0], off, n - off),
                             cls_view(cols_s[1], off, n - off)],
                            axis=-1).reshape(batch * (n - off), 2)
        tail_rad = cls_view(radius_s, off, n - off).reshape(-1)
        tail_con = lax.stop_gradient(jnp.stack(
            [cls_view(cols_s[c], off, n - off) for c in (2, 3, 4)],
            axis=-1).reshape(batch * (n - off), 3))
        _, _, _, _, tail_tu = rects(lax.stop_gradient(tail_m2), tail_rad,
                                    tail_con, 63)
        num_dropped += jnp.sum(tail_tu.reshape(batch, n - off), axis=1)

    props9 = tuple(jnp.concatenate(p) for p in pair_props)
    tile_flat = jnp.concatenate(pair_tile).astype(jnp.float32)
    depth_flat = jnp.concatenate(pair_depth)

    p_in = tile_flat.shape[0]
    p_lim = p_in if pair_budget is None else min(
        batch * int(pair_budget), p_in)
    p_chunks = -(-p_lim // CHUNK)

    props3d, start, count = _pair_sort_pre(
        props9, tile_flat, depth_flat, p_chunks, batch * num_tiles,
        max_per_tile)

    num_pair_dropped = (total_capped_sum
                        - jnp.sum(count.reshape(batch, num_tiles), axis=1))

    out = _composite_core(props3d, start, count, batch, tiles_y,
                          tiles_x, interpret)

    bg = jnp.asarray(bg_color, jnp.float32)
    img_tiles = out[..., 0:3] + out[..., 3:4] * bg[None, None, :]
    tfin_tiles = out[..., 3:4]
    return (_untile(img_tiles, batch, tiles_y, tiles_x, height, width),
            _untile(tfin_tiles, batch, tiles_y, tiles_x, height, width),
            num_dropped, num_pair_dropped)


def _untile(x, batch, tiles_y, tiles_x, height, width):
    ch = x.shape[-1]
    x = x.reshape(batch, tiles_y, tiles_x, TILE, TILE, ch)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(batch, tiles_y * TILE,
                     tiles_x * TILE, ch)[:, :height, :width]


# ---------------------------------------------------------------------------
# compositing kernels
# ---------------------------------------------------------------------------


def _pixel_coords(ty, tx):
    idx = lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + idx % TILE).astype(jnp.float32)
    py = (ty * TILE + idx // TILE).astype(jnp.float32)
    return px, py


def _shift_right(x, s, lane, fill=0.0):
    """Shift lanes right by s, filling with `fill` (lane = lane iota)."""
    return jnp.where(lane >= s, pltpu.roll(x, s, axis=1), fill)


def _cumsum_lanes(x, lane, exclusive: bool):
    """Cumulative sum along the 128-lane pair axis as a Hillis-Steele
    log-shift scan: 7 roll+add VPU steps, exact f32.

    This beats an MXU triangular-matrix matmul both ways: a (PIX, CHUNK) x
    (CHUNK, CHUNK) dot costs a full systolic pass per chunk (x3 at the
    HIGHEST precision the transmittance chain needs), while the scan is a
    handful of cheap vector ops with no precision compromise.
    """
    s = 1
    while s < CHUNK:
        x = x + _shift_right(x, s, lane)
        s *= 2
    return _shift_right(x, 1, lane) if exclusive else x


def _cumprod_lanes_excl(x, lane):
    """Exclusive cumulative product along the lane axis (same scan shape).

    Multiplicative transmittance is both cheaper and closer to the CUDA
    walk than the round-1 exp(cumsum(log1p)) chain: it drops two
    transcendentals per pair-pixel and accumulates T by the same repeated
    f32 multiplies the reference performs."""
    s = 1
    while s < CHUNK:
        x = x * _shift_right(x, s, lane, fill=1.0)
        s *= 2
    return _shift_right(x, 1, lane, fill=1.0)


def _chunk_terms(p, px, py, base, head, total, T, done, lane):
    """Shared fwd/bwd per-chunk math.

    p: (PROPW, CHUNK) property-major chunk.  Pixel-pair arrays are
    (PIX, CHUNK) = pixels-on-sublanes x pairs-on-lanes.  `base` is this
    chunk's pair offset from the segment's aligned start; pairs outside
    [head, total) belong to a neighboring tile (or padding) and are
    masked out.  T is the (PIX, 1) transmittance carry.
    """
    mx, my = p[0:1, :], p[1:2, :]
    ca, cb, cc = p[2:3, :], p[3:4, :], p[4:5, :]
    op = p[5:6, :]

    dx = px - mx                                    # (PIX, CHUNK)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy

    jcol = lane[0:1, :] + base
    in_seg = (jcol >= head) & (jcol < total)

    alpha_un = op * jnp.exp(power)
    alpha = jnp.minimum(alpha_un, ALPHA_MAX)
    include = in_seg & (power <= 0.0) & (alpha >= ALPHA_MIN)
    alpha = jnp.where(include, alpha, 0.0)
    one_m = 1.0 - alpha                             # 1 where not included

    t_excl = T * _cumprod_lanes_excl(one_m, lane)
    # accumulated transmittance is monotone non-increasing, so pairs that
    # cross T_EPS form a SUFFIX: a pair blends iff it does not itself
    # violate (no cumulative violation count needed)
    viol = include & (t_excl * one_m < T_EPS)
    blend = include & jnp.logical_not(viol) & (done < 0.5)

    w = jnp.where(blend, alpha * t_excl, 0.0)
    # the carry is the transmittance AFTER the last blended pair, which is
    # exactly min over blended lanes of t_excl * one_m (T is monotone
    # non-increasing) — one masked max-reduce, no scan and no product.
    # Blended-only semantics match the oracle's t_final; once done, T no
    # longer matters (every later w is 0).
    T_new = -jnp.max(jnp.where(blend, -(t_excl * one_m), -T), axis=1,
                     keepdims=True)
    done_new = jnp.maximum(
        done, jnp.max(viol.astype(jnp.float32), axis=1, keepdims=True))
    return dict(dx=dx, dy=dy, power=power, alpha_un=alpha_un, alpha=alpha,
                blend=blend, w=w, t_excl=t_excl, T=T_new,
                done=done_new, conic=(ca, cb, cc))


def _segment_geom(start, count):
    c0 = lax.div(start, CHUNK)
    head = start - c0 * CHUNK
    total = head + count
    nchunks = jnp.where(count > 0,
                        lax.div(total + CHUNK - 1, CHUNK),
                        jnp.zeros((), jnp.int32))
    return c0, head, total, nchunks


def _fwd_kernel(start_ref, count_ref, props_ref, out_ref, scratch, sem):
    tiles_y, tiles_x = pl.num_programs(1), pl.num_programs(2)
    b, ty, tx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    t = (b * tiles_y + ty) * tiles_x + tx
    c0, head, total, nchunks = _segment_geom(start_ref[t], count_ref[t])

    px, py = _pixel_coords(ty, tx)
    lane = lax.broadcasted_iota(jnp.int32, (PIX, CHUNK), 1)

    def get_dma(slot, si):
        return pltpu.make_async_copy(
            props_ref.at[pl.ds(c0 + si * DCH, DCH)],
            scratch.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    # step-level while loop (DCH chunks per step, double-buffered DMA)
    # with EARLY TERMINATION: once every pixel of the tile has crossed
    # T_EPS no later pair can blend (transmittance is monotone), so the
    # rest of the segment is skipped — the CUDA kernel's all-threads-done
    # exit.  Opaque scenes saturate after a few chunks of a deep segment.
    def cond(carry):
        si, T, acc, done = carry
        return (si * DCH < nchunks) & (jnp.sum(done) < PIX - 0.5)

    def step(carry):
        si, T, acc, done = carry
        slot = lax.rem(si, 2)

        @pl.when((si + 1) * DCH < nchunks)
        def _():
            get_dma(lax.rem(si + 1, 2), si + 1).start()

        get_dma(slot, si).wait()

        for j in range(DCH):
            ci = si * DCH + j
            p = scratch[slot, j]
            terms = _chunk_terms(p, px, py, ci * CHUNK, head, total, T,
                                 done, lane)
            w = terms["w"]
            # per-channel weighted lane reduction (VPU) instead of an MXU
            # dot: a (CHUNK, 3) contraction still costs a full systolic
            # pass.  Chunks past the segment only see masked-out pairs
            # (in_seg is false), so no pl.when guard is needed.
            acc = acc + jnp.concatenate(
                [jnp.sum(w * p[6 + c:7 + c, :], axis=1, keepdims=True)
                 for c in range(3)], axis=1)
            T, done = terms["T"], terms["done"]
        return si + 1, T, acc, done

    si_f, T, acc, _ = lax.while_loop(
        cond, step, (jnp.zeros((), jnp.int32),
                     jnp.ones((PIX, 1), jnp.float32),
                     jnp.zeros((PIX, 3), jnp.float32),
                     jnp.zeros((PIX, 1), jnp.float32)))

    # early exit leaves the NEXT step's prefetch in flight — drain it so
    # the scratch/semaphore can be reused by the next grid iteration
    @pl.when(si_f * DCH < nchunks)
    def _():
        get_dma(lax.rem(si_f, 2), si_f).wait()

    out_ref[0, :, 0:3] = acc
    out_ref[0, :, 3:4] = T


def _bwd_kernel(start_ref, count_ref, props_ref, res_ref, g_ref, zeros_ref,
                gout_ref, scratch, gscratch, mscratch, sem, gsem, msem):
    tiles_y, tiles_x = pl.num_programs(1), pl.num_programs(2)
    b, ty, tx = pl.program_id(0), pl.program_id(1), pl.program_id(2)
    t = (b * tiles_y + ty) * tiles_x + tx
    c0, head, total, nchunks = _segment_geom(start_ref[t], count_ref[t])

    px, py = _pixel_coords(ty, tx)
    lane = lax.broadcasted_iota(jnp.int32, (PIX, CHUNK), 1)

    res = res_ref[0]                            # (PIX, 4) [pre rgb, tfin]
    g = g_ref[0]                                # (PIX, 4) cotangents
    g3 = g[:, 0:3]
    # dL/dalpha suffix constant: g . pre_total + g_tfin * tfin
    suffix_const = (jnp.sum(g3 * res[:, 0:3], axis=1, keepdims=True)
                    + g[:, 3:4] * res[:, 3:4])  # (PIX, 1)

    def get_dma(slot, si):
        return pltpu.make_async_copy(
            props_ref.at[pl.ds(c0 + si * DCH, DCH)],
            scratch.at[slot], sem.at[slot])

    def gout_dma(slot, si):
        return pltpu.make_async_copy(
            gscratch.at[slot],
            gout_ref.at[pl.ds(c0 + si * DCH, DCH)], gsem.at[slot])

    def merge_dma():
        # the first chunk of this segment may be shared with the previous
        # tile's tail; the grid is sequential, so read-modify-write merges
        # the two tiles' disjoint-support gradients without races
        return pltpu.make_async_copy(gout_ref.at[c0], mscratch, msem)

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()
        merge_dma().start()

    # step-level while with the same early termination as the forward:
    # once all pixels are done every remaining pair has w = 0 and zero
    # gradient, and gout is zero-initialised (input_output_aliases), so
    # skipping the writes leaves exactly the right values
    def cond(carry):
        si, T, done, p_gc = carry
        return (si * DCH < nchunks) & (jnp.sum(done) < PIX - 0.5)

    def step(carry):
        si, T, done, p_gc = carry
        slot = lax.rem(si, 2)

        @pl.when((si + 1) * DCH < nchunks)
        def _():
            get_dma(lax.rem(si + 1, 2), si + 1).start()

        get_dma(slot, si).wait()

        # this slot's previous gradient write must drain before reuse,
        # then the whole slot is zeroed: chunks past the segment and
        # rows 9..15 must not leak stale data into the RMW merges
        @pl.when(si >= 2)
        def _():
            gout_dma(slot, si - 2).wait()

        gscratch[slot] = jnp.zeros((DCH, PROPW, CHUNK), jnp.float32)

        for j in range(DCH):
            ci = si * DCH + j
            p = scratch[slot, j]
            terms = _chunk_terms(p, px, py, ci * CHUNK, head, total, T,
                                 done, lane)
            w, t_excl, alpha = terms["w"], terms["t_excl"], terms["alpha"]
            alpha_un, power = terms["alpha_un"], terms["power"]
            blend = terms["blend"]
            dx, dy = terms["dx"], terms["dy"]
            ca, cb, cc = terms["conic"]

            # gc[p, k] = sum_c g3[p, c] * color[c, k]: three outer-product
            # FMAs on the VPU (an MXU (3, CHUNK) dot costs a full pass)
            gc = (g3[:, 0:1] * p[6:7, :] + g3[:, 1:2] * p[7:8, :]
                  + g3[:, 2:3] * p[8:9, :])         # (PIX, CHUNK)
            wgc = w * gc
            p_gc_incl = _cumsum_lanes(wgc, lane, exclusive=False) + p_gc

            one_m = jnp.maximum(1.0 - alpha, 1e-6)
            g_alpha = jnp.where(
                blend, gc * t_excl - (suffix_const - p_gc_incl) / one_m,
                0.0)

            not_clamped = (alpha_un < ALPHA_MAX).astype(jnp.float32)
            # G = exp(power) recovered from alpha_un = op * exp(power) by
            # one reciprocal-mul instead of a second transcendental per
            # pair-pixel (the fwd's exp already ran inside _chunk_terms).
            # op <= 0 rows never blend (alpha = 0 -> g_alpha = 0), and the
            # clamped reciprocal keeps the dead product finite, so the
            # masked result is bitwise 0 exactly as before.
            G = alpha_un / jnp.maximum(p[5:6, :], 1e-30)
            gp = g_alpha * alpha_un * not_clamped  # dL/dpower (PIX, CHUNK)

            gscratch[slot, j, 0:1, :] = jnp.sum(
                gp * (ca * dx + cb * dy), axis=0, keepdims=True)
            gscratch[slot, j, 1:2, :] = jnp.sum(
                gp * (cc * dy + cb * dx), axis=0, keepdims=True)
            gscratch[slot, j, 2:3, :] = jnp.sum(
                gp * (-0.5 * dx * dx), axis=0, keepdims=True)
            gscratch[slot, j, 3:4, :] = jnp.sum(
                gp * (-dx * dy), axis=0, keepdims=True)
            gscratch[slot, j, 4:5, :] = jnp.sum(
                gp * (-0.5 * dy * dy), axis=0, keepdims=True)
            gscratch[slot, j, 5:6, :] = jnp.sum(
                g_alpha * G * not_clamped, axis=0, keepdims=True)
            for c in range(3):
                gscratch[slot, j, 6 + c:7 + c, :] = jnp.sum(
                    g3[:, c:c + 1] * w, axis=0, keepdims=True)

            @pl.when(ci == 0)
            def _():
                merge_dma().wait()
                gscratch[0, 0] = gscratch[0, 0] + mscratch[:, :]

            p_gc = p_gc + jnp.sum(wgc, axis=1, keepdims=True)
            T, done = terms["T"], terms["done"]

        gout_dma(slot, si).start()
        return si + 1, T, done, p_gc

    z1 = jnp.zeros((PIX, 1), jnp.float32)
    si_f, _, _, _ = lax.while_loop(
        cond, step, (jnp.zeros((), jnp.int32),
                     jnp.ones((PIX, 1), jnp.float32), z1, z1))

    # drain: the possibly-in-flight input prefetch for step si_f, then the
    # last (up to) two outstanding gout flushes
    @pl.when(si_f * DCH < nchunks)
    def _():
        get_dma(lax.rem(si_f, 2), si_f).wait()

    def drain(k, _):
        gout_dma(lax.rem(k, 2), k).wait()
        return 0

    lax.fori_loop(jnp.maximum(si_f - 2, 0), si_f, drain, 0)


def _grids(height, width):
    return -(-height // TILE), -(-width // TILE)


def _run_fwd(props, start, count, batch, tiles_y, tiles_x, interpret):
    num_tiles = batch * tiles_y * tiles_x
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, PIX, OUTC),
            lambda b, i, j, *_: ((b * tiles_y + i) * tiles_x + j, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, DCH, PROPW, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, OUTC), jnp.float32),
        interpret=interpret,
    )(start, count, props)


def _run_bwd(props, start, count, res, g_res, batch, tiles_y, tiles_x,
             interpret):
    zeros = jnp.zeros_like(props)

    def out_map(b, i, j, *_):
        return ((b * tiles_y + i) * tiles_x + j, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),              # props
            pl.BlockSpec((1, PIX, OUTC), out_map,
                         memory_space=pltpu.VMEM),             # residual out
            pl.BlockSpec((1, PIX, OUTC), out_map,
                         memory_space=pltpu.VMEM),             # cotangent
            pl.BlockSpec(memory_space=pltpu.HBM),              # zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, DCH, PROPW, CHUNK), jnp.float32),
            pltpu.VMEM((2, DCH, PROPW, CHUNK), jnp.float32),
            pltpu.VMEM((PROPW, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(props.shape, jnp.float32),
        input_output_aliases={5: 0},   # zeros input (incl. 2 prefetch args)
        interpret=interpret,
    )(start, count, props, res, g_res, zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _composite_core(props, start, count, batch, tiles_y, tiles_x,
                    interpret):
    """(nch, 16, 128) props + (B*T,) i32 segment starts/counts
    -> (B*T, PIX, 4).

    start/count are INTEGER inputs (f32 rounds above 2^24 — see
    _pair_sort); their cotangents are float0 zeros.
    """
    return _run_fwd(props, start, count, batch, tiles_y, tiles_x,
                    interpret)


def _composite_core_fwd(props, start, count, batch, tiles_y, tiles_x,
                        interpret):
    out = _run_fwd(props, start, count, batch, tiles_y, tiles_x,
                   interpret)
    return out, (props, start, count, out)


def _composite_core_bwd(batch, tiles_y, tiles_x, interpret, saved, g_out):
    import numpy as np

    props, start, count, out = saved
    gprops = _run_bwd(props, start, count, out, g_out,
                      batch, tiles_y, tiles_x, interpret)
    zint = np.zeros(start.shape, dtype=jax.dtypes.float0)
    return gprops, zint, zint


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


# ---------------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------------


def render_sorted(stacked, height: int, width: int, max_tiles: int,
                  max_per_tile: int, pair_budget, bg_color,
                  interpret: bool = False):
    """Full pallas path: (B, C, 16) stacked rows -> rendered tile images.

    The whole batch runs through ONE pair sort (global tile ids offset by
    b * tiles) and ONE kernel launch with a (B, ty, tx) grid — the fused
    replacement for vmapping the per-sample pipeline, whose sort/scatter
    stages cost ~60 ms per extra sample at 1024^2 (round-1 ROADMAP #9).

    Returns (image (B, H, W, 3), transmittance (B, H, W, 1), and
    per-sample counters num_dup_dropped (B,), num_pair_dropped (B,)).
    pair_budget is PER SAMPLE (the array holds B * pair_budget pairs);
    when it binds, truncation falls on the globally-last sorted pairs —
    i.e. the highest batch indices' deepest tiles — so size it to bind
    never (drops are counted per sample either way).
    Differentiable w.r.t. stacked columns 0..8 (the binning keys in
    columns 9..10 are positional, gradient-free — matching the CUDA
    rasterizer, which treats the sort order as fixed).
    """
    batch, n = stacked.shape[0], stacked.shape[1]
    tiles_y, tiles_x = _grids(height, width)
    num_tiles = tiles_y * tiles_x
    flat = stacked.reshape(batch * n, PROPW)

    mean2d = flat[:, 0:2]
    depth = flat[:, 9]
    radius = flat[:, 10]
    x_min, y_min, span_x, total, total_uncapped = tile_rects(
        mean2d, radius, tiles_y, tiles_x, TILE, max_tiles)
    num_dropped = jnp.sum((total_uncapped - total).reshape(batch, n),
                          axis=1)

    k = jnp.arange(max_tiles, dtype=jnp.int32)
    dx, dy = expand_rect_offsets(jnp.maximum(span_x, 1), max_tiles)
    pair_live = k[None, :] < total[:, None]
    tile_id = (y_min[:, None] + dy) * tiles_x + (x_min[:, None] + dx)
    # globalize per sample; one shared sentinel keeps dead pairs last
    boff = jnp.repeat(jnp.arange(batch, dtype=jnp.int32) * num_tiles, n)
    tile_id = tile_id + boff[:, None]
    tile_id = jnp.where(pair_live, tile_id, batch * num_tiles)

    nK = batch * n * max_tiles
    p_lim = nK if pair_budget is None else min(batch * int(pair_budget),
                                               nK)
    p_chunks = -(-p_lim // CHUNK)

    depth_b = jnp.broadcast_to(
        lax.stop_gradient(depth)[:, None],
        (batch * n, max_tiles)).reshape(-1)
    props3d, start, count = _pair_sort(
        flat, tile_id.reshape(-1).astype(jnp.float32), depth_b,
        max_tiles, p_chunks, batch * num_tiles, max_per_tile)

    num_pair_dropped = (
        jnp.sum(total.reshape(batch, n), axis=1)
        - jnp.sum(count.reshape(batch, num_tiles), axis=1))

    out = _composite_core(props3d, start, count, batch, tiles_y,
                          tiles_x, interpret)

    bg = jnp.asarray(bg_color, jnp.float32)
    img_tiles = out[..., 0:3] + out[..., 3:4] * bg[None, None, :]
    tfin_tiles = out[..., 3:4]

    def untile(x):
        ch = x.shape[-1]
        x = x.reshape(batch, tiles_y, tiles_x, TILE, TILE, ch)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(batch, tiles_y * TILE,
                         tiles_x * TILE, ch)[:, :height, :width]

    return (untile(img_tiles), untile(tfin_tiles), num_dropped,
            num_pair_dropped)
