"""Pallas TPU kernels for tiled Gaussian alpha compositing (fwd + bwd).

Replaces the per-tile compositing loops of the reference's external CUDA
rasterizer (SURVEY.md §2.3 N1) with a TPU-native formulation:

* binned pairs are repacked PROPERTY-MAJOR into a (16, P) f32 array whose
  tile segments start at 128-pair boundaries, so every chunked DMA slice is
  lane-aligned (Mosaic requires 128-lane alignment on manual HBM slices);
* each tile's depth-sorted segment is streamed in double-buffered chunks of
  128 pairs; compute layout is pixels-on-sublanes (256) x pairs-on-lanes
  (128) — no transposes anywhere;
* front-to-back transmittance is an exclusive cumulative sum of log(1-alpha)
  along the pair axis, computed as a triangular-matrix matmul on the MXU
  (fully parallel over pixels — no sequential walk, no atomics);
* the backward kernel re-walks the same chunks computing analytic gradients
  (suffix contributions via inclusive cumsums) and writes per-PAIR gradient
  rows; each pair belongs to exactly one tile, so the only cross-pair
  reduction is the per-Gaussian scatter-add that JAX AD emits for the
  pack_props gathers (deterministic, no atomics).

Only the pallas composite carries a custom VJP; packing (gather) and
unpacking stay ordinary differentiable jnp.

Property rows of the (16, P) array:
  0 mx, 1 my, 2 conic_a, 3 conic_b, 4 conic_c, 5 opacity,
  6..8 rgb, 9 live, 10..15 padding.  Gradient rows mirror slots 0..8.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gps_gaussian_tpu.kernels.rasterizer.reference import (ALPHA_MAX,
                                                           ALPHA_MIN, T_EPS)

CHUNK = 128          # pairs per streamed chunk (= lane width)
PROPW = 16           # packed property rows
TILE = 16            # pixels per tile side
PIX = TILE * TILE    # 256 pixel sublanes
OUTC = 4             # output channels per tile pixel: r, g, b, transmittance


class PaddedSegments(NamedTuple):
    """Pair layout whose tile segments start at CHUNK-aligned offsets."""

    gauss_index: jnp.ndarray   # (P_pad,) i32 source Gaussian per slot
    pair_slot: jnp.ndarray     # (P_pad,) i32 unique pre-sort id g*K + k
    live: jnp.ndarray          # (P_pad,) f32 {0,1}
    tile_start: jnp.ndarray    # (T,) i32, every entry a multiple of CHUNK
    tile_count: jnp.ndarray    # (T,) i32 (capped at max_per_tile)


def pad_segments(sorted_tile: jnp.ndarray, sorted_slot: jnp.ndarray,
                 dup_cap: int, pair_valid: jnp.ndarray,
                 tile_start: jnp.ndarray, tile_count: jnp.ndarray,
                 max_per_tile: int,
                 pair_budget: int | None = None) -> PaddedSegments:
    """Re-index sorted pairs so each tile's segment is CHUNK-aligned.

    pair_budget bounds the number of REAL (valid) sorted pairs processed —
    invalid pairs sort behind the sentinel tile id, so the real ones are a
    contiguous prefix and a static slice is exact (overflow tiles are
    truncated at their far end, like the max_per_tile cap).
    """
    num_tiles = tile_start.shape[0]
    p_total = sorted_tile.shape[0]
    if pair_budget is not None and pair_budget < p_total:
        sorted_slot = sorted_slot[:pair_budget]
        p_total = pair_budget
        tile_start = jnp.minimum(tile_start, p_total)
        tile_count = jnp.minimum(tile_count, p_total - tile_start)
    count = jnp.minimum(tile_count, max_per_tile)
    padded = ((count + CHUNK - 1) // CHUNK) * CHUNK
    cum = jnp.cumsum(padded).astype(jnp.int32)              # inclusive
    pstart = jnp.concatenate([jnp.zeros((1,), jnp.int32), cum[:-1]])
    # static worst case, rounded to a whole number of chunks
    p_pad = ((p_total + CHUNK - 1) // CHUNK + num_tiles) * CHUNK

    # gather-only inverse mapping, computed PER CHUNK then broadcast:
    # every segment start is CHUNK-aligned, so all 128 slots of a chunk
    # share one tile.  This cuts the binary-search query count by 128x
    # (3.9M-query searchsorted measured 340 ms; 30k-query is 5 ms).
    # NOTE pair_valid is intentionally unused: invalid pairs carry the
    # sentinel tile id, sort to the very end, and are excluded by the
    # segment counts — re-gathering the flag cost a pointless ~30 ms.
    assert p_pad % CHUNK == 0
    nch = p_pad // CHUNK
    ch0 = jnp.arange(nch, dtype=jnp.int32) * CHUNK
    tile_of = jnp.searchsorted(cum, ch0, side="right").astype(jnp.int32)
    tile_cl = jnp.clip(tile_of, 0, num_tiles - 1)
    lane = jnp.arange(CHUNK, dtype=jnp.int32)[None, :]
    offset = (ch0 - pstart[tile_cl])[:, None] + lane        # (nch, CHUNK)
    live_b = (tile_of[:, None] < num_tiles) & (offset < count[tile_cl][:, None])
    src = jnp.clip(tile_start[tile_cl][:, None] + offset, 0, p_total - 1)

    slot = jnp.where(
        live_b, sorted_slot[src.reshape(-1)].reshape(nch, CHUNK), 0)
    return PaddedSegments(gauss_index=(slot // dup_cap).reshape(-1),
                          pair_slot=slot.reshape(-1),
                          live=live_b.astype(jnp.float32).reshape(-1),
                          tile_start=pstart, tile_count=count)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gather_rows(stacked, gidx_f, slot_f, live, dup_cap):
    """Row gather with a gather-based backward segment-sum.

    JAX AD would emit a duplicate-index ROW scatter-add for the backward,
    which is pathologically slow on TPU (measured 200 ms at production
    sizes, vs 28 ms for the equivalent gathers).  Because every pair
    carries a UNIQUE pre-sort slot id, the backward can instead be one
    scalar int scatter (building the slot->position inverse map) plus a
    dense row-gather + reshape-sum over the K duplicate axis.

    gidx/slot travel as f32 so the cotangent structure stays all-float
    (both are exact integers well below 2^24).
    """
    n = stacked.shape[0]
    idx = jnp.clip(gidx_f.astype(jnp.int32), 0, n - 1)
    return stacked[idx] * live[:, None]                     # (P_pad, 16)


def _gather_rows_fwd(stacked, gidx_f, slot_f, live, dup_cap):
    out = _gather_rows(stacked, gidx_f, slot_f, live, dup_cap)
    return out, (stacked.shape[0], slot_f, live)


def _gather_rows_bwd(dup_cap, saved, g):
    n, slot_f, live = saved
    K = dup_cap
    p_pad = slot_f.shape[0]
    # inverse map: pre-sort slot -> padded position (sentinel p_pad)
    target = jnp.where(live > 0.5, slot_f.astype(jnp.int32), n * K)
    inv = jnp.full((n * K + 1,), p_pad, jnp.int32).at[target].set(
        jnp.arange(p_pad, dtype=jnp.int32), mode="drop",
        unique_indices=True)[: n * K]
    g_pad = jnp.concatenate([g, jnp.zeros((1, g.shape[1]), g.dtype)])
    contrib = g_pad[inv]                                    # (n*K, 16)
    dstacked = contrib.reshape(n, K, g.shape[1]).sum(axis=1)
    return (dstacked, jnp.zeros_like(slot_f), jnp.zeros_like(slot_f),
            jnp.zeros_like(live))


_gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)


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


def stack_rows(mean2d, conic, opacity, color, extra=None):
    """Per-Gaussian properties as contiguous (N, 16) rows.

    Rows 0..8 are the kernel's inputs, row 9 a live placeholder; rows
    10..15 may hold extras (e.g. depth/radius for binning) — the kernel
    ignores them."""
    n = mean2d.shape[0]
    cols = [mean2d, conic, opacity.reshape(n, 1), color,
            jnp.ones((n, 1), jnp.float32)]
    width = 10
    if extra is not None:
        cols.append(extra)
        width += extra.shape[1]
    cols.append(jnp.zeros((n, PROPW - width), jnp.float32))
    return jnp.concatenate(cols, axis=1)


def pack_stacked(stacked, seg: PaddedSegments, dup_cap: int):
    """(N, 16) rows -> (16, P_pad+CHUNK) property-major pallas input."""
    props = _gather_rows(stacked, seg.gauss_index.astype(jnp.float32),
                         seg.pair_slot.astype(jnp.float32), seg.live,
                         dup_cap)                           # (P_pad, 16)
    # tail margin so the last chunk's DMA stays in bounds
    return jnp.pad(props.T, ((0, 0), (0, CHUNK)))


def pack_props(mean2d, conic, opacity, color, seg: PaddedSegments,
               dup_cap: int):
    """Convenience wrapper: stack_rows + pack_stacked."""
    return pack_stacked(stack_rows(mean2d, conic, opacity, color), seg,
                        dup_cap)


def _pixel_coords(ty, tx):
    idx = lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = (tx * TILE + idx % TILE).astype(jnp.float32)
    py = (ty * TILE + idx // TILE).astype(jnp.float32)
    return px, py


def _tri_excl():
    """tri[j, i] = 1 where j < i: right-multiplying computes an exclusive
    cumulative sum along the pair (lane) axis on the MXU."""
    r = lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 0)
    c = lax.broadcasted_iota(jnp.int32, (CHUNK, CHUNK), 1)
    return (r < c).astype(jnp.float32)


def _dot(a, b, contract):
    # HIGHEST: bf16x3 passes == true f32 — the default single bf16 pass
    # loses ~3 decimal digits, visibly corrupting transmittance cumsums
    return lax.dot_general(a, b, (contract, ((), ())),
                           preferred_element_type=jnp.float32,
                           precision=lax.Precision.HIGHEST)


def _chunk_terms(p, px, py, ci, count, logT, done, tri):
    """Shared fwd/bwd per-chunk math.

    p: (PROPW, CHUNK) property-major chunk.  Pixel-pair arrays are
    (PIX, CHUNK) = pixels-on-sublanes x pairs-on-lanes.
    """
    mx, my = p[0:1, :], p[1:2, :]
    ca, cb, cc = p[2:3, :], p[3:4, :], p[4:5, :]
    op, live = p[5:6, :], p[9:10, :]

    dx = px - mx                                    # (PIX, CHUNK)
    dy = py - my
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy

    jcol = lax.broadcasted_iota(jnp.int32, (1, CHUNK), 1) + ci * CHUNK
    in_count = jcol < count

    alpha_un = op * jnp.exp(power)
    alpha = jnp.minimum(alpha_un, ALPHA_MAX)
    include = ((live > 0.5) & in_count & (power <= 0.0)
               & (alpha >= ALPHA_MIN))
    alpha = jnp.where(include, alpha, 0.0)
    log1m = jnp.log1p(-alpha)

    csum_ex = _dot(log1m, tri, (((1,), (0,))))       # exclusive cumsum
    t_excl = jnp.exp(logT + csum_ex)
    viol = include & (t_excl * (1.0 - alpha) < T_EPS)
    violf = viol.astype(jnp.float32)
    nviol_incl = _dot(violf, tri, (((1,), (0,)))) + violf
    blend = include & (nviol_incl < 0.5) & (done < 0.5)

    w = jnp.where(blend, alpha * t_excl, 0.0)
    logT_new = logT + jnp.sum(jnp.where(blend, log1m, 0.0), axis=1,
                              keepdims=True)
    done_new = jnp.maximum(done, jnp.max(violf, axis=1, keepdims=True))
    return dict(dx=dx, dy=dy, power=power, alpha_un=alpha_un, alpha=alpha,
                blend=blend, w=w, t_excl=t_excl, logT=logT_new,
                done=done_new, conic=(ca, cb, cc))


def _fwd_kernel(start_ref, count_ref, props_ref, out_ref, scratch, sem):
    tiles_x = pl.num_programs(1)
    ty, tx = pl.program_id(0), pl.program_id(1)
    t = ty * tiles_x + tx
    start = start_ref[t]
    count = count_ref[t]
    nchunks = lax.div(count + CHUNK - 1, CHUNK)

    px, py = _pixel_coords(ty, tx)
    tri = _tri_excl()

    def get_dma(slot, ci):
        off = pl.multiple_of(start + ci * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            props_ref.at[:, pl.ds(off, CHUNK)],
            scratch.at[slot], sem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(ci, carry):
        logT, acc, done = carry                 # (PIX,1), (PIX,3), (PIX,1)
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            get_dma((ci + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()
        p = scratch[slot]
        terms = _chunk_terms(p, px, py, ci, count, logT, done, tri)
        col3 = p[6:9, :]                        # (3, CHUNK)
        acc = acc + _dot(terms["w"], col3, (((1,), (1,))))
        return terms["logT"], acc, terms["done"]

    z1 = jnp.zeros((PIX, 1), jnp.float32)
    logT, acc, _ = lax.fori_loop(
        0, nchunks, body, (z1, jnp.zeros((PIX, 3), jnp.float32), z1))

    out_ref[0, :, 0:3] = acc
    out_ref[0, :, 3:4] = jnp.exp(logT)


def _bwd_kernel(start_ref, count_ref, props_ref, res_ref, g_ref, zeros_ref,
                gout_ref, scratch, gscratch, sem, gsem):
    tiles_x = pl.num_programs(1)
    ty, tx = pl.program_id(0), pl.program_id(1)
    t = ty * tiles_x + tx
    start = start_ref[t]
    count = count_ref[t]
    nchunks = lax.div(count + CHUNK - 1, CHUNK)

    px, py = _pixel_coords(ty, tx)
    tri = _tri_excl()

    res = res_ref[0]                            # (PIX, 4) [pre rgb, tfin]
    g = g_ref[0]                                # (PIX, 4) cotangents
    g3 = g[:, 0:3]
    # dL/dalpha suffix constant: g . pre_total + g_tfin * tfin
    suffix_const = (jnp.sum(g3 * res[:, 0:3], axis=1, keepdims=True)
                    + g[:, 3:4] * res[:, 3:4])  # (PIX, 1)

    def get_dma(slot, ci):
        off = pl.multiple_of(start + ci * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            props_ref.at[:, pl.ds(off, CHUNK)],
            scratch.at[slot], sem.at[slot])

    def gout_dma(slot, ci):
        off = pl.multiple_of(start + ci * CHUNK, CHUNK)
        return pltpu.make_async_copy(
            gscratch.at[slot],
            gout_ref.at[:, pl.ds(off, CHUNK)],
            gsem.at[slot])

    @pl.when(nchunks > 0)
    def _():
        get_dma(0, 0).start()

    def body(ci, carry):
        logT, done, p_gc = carry
        slot = ci % 2

        @pl.when(ci + 1 < nchunks)
        def _():
            get_dma((ci + 1) % 2, ci + 1).start()

        get_dma(slot, ci).wait()
        p = scratch[slot]
        terms = _chunk_terms(p, px, py, ci, count, logT, done, tri)
        w, t_excl, alpha = terms["w"], terms["t_excl"], terms["alpha"]
        alpha_un, power = terms["alpha_un"], terms["power"]
        blend = terms["blend"]
        dx, dy = terms["dx"], terms["dy"]
        ca, cb, cc = terms["conic"]
        col3 = p[6:9, :]                        # (3, CHUNK)

        gc = _dot(g3, col3, (((1,), (0,))))     # (PIX, CHUNK)
        wgc = w * gc
        p_gc_incl = _dot(wgc, tri, (((1,), (0,)))) + wgc + p_gc

        one_m = jnp.maximum(1.0 - alpha, 1e-6)
        g_alpha = jnp.where(
            blend, gc * t_excl - (suffix_const - p_gc_incl) / one_m, 0.0)

        not_clamped = (alpha_un < ALPHA_MAX).astype(jnp.float32)
        G = jnp.exp(power)
        gp = g_alpha * alpha_un * not_clamped   # dL/dpower (PIX, CHUNK)

        g_op = jnp.sum(g_alpha * G * not_clamped, axis=0, keepdims=True)
        g_mx = jnp.sum(gp * (ca * dx + cb * dy), axis=0, keepdims=True)
        g_my = jnp.sum(gp * (cc * dy + cb * dx), axis=0, keepdims=True)
        g_ca = jnp.sum(gp * (-0.5 * dx * dx), axis=0, keepdims=True)
        g_cb = jnp.sum(gp * (-dx * dy), axis=0, keepdims=True)
        g_cc = jnp.sum(gp * (-0.5 * dy * dy), axis=0, keepdims=True)
        g_col = _dot(g3, w, (((0,), (0,))))     # (3, CHUNK)

        # this slot's previous gradient write must drain before reuse
        @pl.when(ci >= 2)
        def _():
            gout_dma(slot, ci - 2).wait()

        gscratch[slot, 0:1, :] = g_mx
        gscratch[slot, 1:2, :] = g_my
        gscratch[slot, 2:3, :] = g_ca
        gscratch[slot, 3:4, :] = g_cb
        gscratch[slot, 4:5, :] = g_cc
        gscratch[slot, 5:6, :] = g_op
        gscratch[slot, 6:9, :] = g_col
        gscratch[slot, 9:16, :] = jnp.zeros((7, CHUNK), jnp.float32)

        gout_dma(slot, ci).start()

        return (terms["logT"], terms["done"],
                p_gc + jnp.sum(wgc, axis=1, keepdims=True))

    z1 = jnp.zeros((PIX, 1), jnp.float32)
    lax.fori_loop(0, nchunks, body, (z1, z1, z1))

    def drain(ci, _):
        gout_dma(ci % 2, ci).wait()
        return 0

    lax.fori_loop(jnp.maximum(nchunks - 2, 0), nchunks, drain, 0)


def _grids(height, width):
    return -(-height // TILE), -(-width // TILE)


def _run_fwd(props, start, count, tiles_y, tiles_x, interpret):
    num_tiles = tiles_y * tiles_x
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, PIX, OUTC), lambda i, j, *_: (i * tiles_x + j, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, PROPW, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _fwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, OUTC), jnp.float32),
        interpret=interpret,
    )(start, count, props)


def _run_bwd(props, start, count, res, g_res, tiles_y, tiles_x, interpret):
    zeros = jnp.zeros_like(props)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(tiles_y, tiles_x),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),              # props
            pl.BlockSpec((1, PIX, OUTC),
                         lambda i, j, *_: (i * tiles_x + j, 0, 0),
                         memory_space=pltpu.VMEM),             # residual out
            pl.BlockSpec((1, PIX, OUTC),
                         lambda i, j, *_: (i * tiles_x + j, 0, 0),
                         memory_space=pltpu.VMEM),             # cotangent
            pl.BlockSpec(memory_space=pltpu.HBM),              # zeros
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, PROPW, CHUNK), jnp.float32),
            pltpu.VMEM((2, PROPW, CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _bwd_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(props.shape, jnp.float32),
        input_output_aliases={5: 0},   # zeros input (incl. 2 prefetch args)
        interpret=interpret,
    )(start, count, props, res, g_res, zeros)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _composite_core(props, start_f, count_f, tiles_y, tiles_x, interpret):
    """(16, P) props + (T,) segment starts/counts -> (T, PIX, 4) tiles.

    start/count travel as f32 so the custom_vjp cotangent structure stays
    all-float (they are exact integers well below 2^24).
    """
    return _run_fwd(props, start_f.astype(jnp.int32),
                    count_f.astype(jnp.int32), tiles_y, tiles_x, interpret)


def _composite_core_fwd(props, start_f, count_f, tiles_y, tiles_x, interpret):
    out = _run_fwd(props, start_f.astype(jnp.int32),
                   count_f.astype(jnp.int32), tiles_y, tiles_x, interpret)
    return out, (props, start_f, count_f, out)


def _composite_core_bwd(tiles_y, tiles_x, interpret, saved, g_out):
    props, start_f, count_f, out = saved
    gprops = _run_bwd(props, start_f.astype(jnp.int32),
                      count_f.astype(jnp.int32), out, g_out,
                      tiles_y, tiles_x, interpret)
    return gprops, jnp.zeros_like(start_f), jnp.zeros_like(count_f)


_composite_core.defvjp(_composite_core_fwd, _composite_core_bwd)


def composite_pairs_pallas(mean2d, conic, opacity, color,
                           seg: PaddedSegments, dup_cap: int,
                           height: int, width: int,
                           bg_color, interpret: bool = False):
    """Composite per-Gaussian properties through padded tile segments.

    Fully differentiable w.r.t. mean2d/conic/opacity/color: the pallas core
    has a custom VJP; packing is plain jnp whose AD emits the deterministic
    per-Gaussian scatter-add.  Returns (image (H,W,3), transmittance
    (H,W,1)).
    """
    tiles_y, tiles_x = _grids(height, width)
    props = pack_props(mean2d, conic, opacity, color, seg, dup_cap)
    return _composite_from_props(props, seg, tiles_y, tiles_x, height,
                                 width, bg_color, interpret)


def composite_stacked_pallas(stacked, seg: PaddedSegments, dup_cap: int,
                             height: int, width: int, bg_color,
                             interpret: bool = False):
    """Composite from pre-stacked (N, 16) rows (no re-concat)."""
    tiles_y, tiles_x = _grids(height, width)
    props = pack_stacked(stacked, seg, dup_cap)
    return _composite_from_props(props, seg, tiles_y, tiles_x, height,
                                 width, bg_color, interpret)


def _composite_from_props(props, seg, tiles_y, tiles_x, height, width,
                          bg_color, interpret):
    out = _composite_core(
        props, seg.tile_start.astype(jnp.float32),
        seg.tile_count.astype(jnp.float32), tiles_y, tiles_x, interpret)

    bg = jnp.asarray(bg_color, jnp.float32)
    img_tiles = out[..., 0:3] + out[..., 3:4] * bg[None, None, :]
    tfin_tiles = out[..., 3:4]

    def untile(x):
        ch = x.shape[-1]
        x = x.reshape(tiles_y, tiles_x, TILE, TILE, ch)
        x = x.transpose(0, 2, 1, 3, 4)
        return x.reshape(tiles_y * TILE, tiles_x * TILE, ch)[:height, :width]

    return untile(img_tiles), untile(tfin_tiles)
