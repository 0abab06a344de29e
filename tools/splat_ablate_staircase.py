#!/usr/bin/env python
"""Stage-by-stage attribution of the STAIRCASE splat pipeline at 1024^2.

Times nested prefixes of the exact headline-bench pipeline (bench.py
scene + config): compaction -> EWA projection -> span sort -> per-class
rect expansion -> pair sort -> composite kernel, fwd and fwd+bwd, with
the chained-fori tunnel protocol.  Every stage output is folded into the
chained scalar (XLA deletes sort operands whose outputs are dead —
ROADMAP timing protocol).

Usage: python tools/splat_ablate_staircase.py [--res 1024]
"""

from __future__ import annotations

import argparse
import importlib.util
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax import lax

    spec = importlib.util.spec_from_file_location(
        "headline_bench", _REPO / "bench.py")
    headline = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(headline)

    from gps_gaussian_tpu.geometry import cameras
    from gps_gaussian_tpu.kernels.rasterizer import (_stack_rows,
                                                     compact_gaussian_inputs)
    from gps_gaussian_tpu.kernels.rasterizer import pallas_kernel as pk
    from gps_gaussian_tpu.kernels.rasterizer.preprocess import \
        project_gaussians

    res = args.res
    xyz, q, scale, opacity, color, valid = headline.build_scene(res)
    K = np.array([[0.8 * res, 0, res / 2],
                  [0, 0.8 * res, res / 2 + 25], [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    E[1, 3] = -0.85
    E[2, 3] = 2.0
    cam = cameras.camera_from_intr_extr(K, E, res, res)
    cfg = headline.bench_raster_config()
    view, proj = jnp.asarray(cam["view"]), jnp.asarray(cam["proj"])
    tfx, tfy = cam["tanfovx"], cam["tanfovy"]
    bg = jnp.zeros(3, jnp.float32)
    A = (jnp.asarray(xyz), jnp.asarray(q), jnp.asarray(scale),
         jnp.asarray(opacity), jnp.asarray(color))
    valid_j = jnp.asarray(valid)

    tiles_y, tiles_x = pk._grids(res, res)
    num_tiles = tiles_y * tiles_x

    def upto_compact(xyz, q, scale, opacity, color):
        (xyz, q, scale, opacity, color, v2), nd = compact_gaussian_inputs(
            xyz, q, scale, opacity, color, valid_j, cfg.fg_cap)
        return sum(jnp.sum(t) for t in (xyz, q, scale, opacity, color, v2))

    def _projected(xyz, q, scale, opacity, color):
        (xyz, q, scale, opacity, color, v2), nd = compact_gaussian_inputs(
            xyz, q, scale, opacity, color, valid_j, cfg.fg_cap)
        projd = project_gaussians(xyz, q, scale, opacity, color, v2,
                                  view, proj, tfx, tfy, res, res)
        return _stack_rows(projd)

    def upto_project(xyz, q, scale, opacity, color):
        return jnp.sum(_projected(xyz, q, scale, opacity, color))

    def _span_sorted(stacked1):
        # mirrors render_sorted_staircase rows 533-560 for batch 1
        flat = stacked1
        n = flat.shape[0]
        mean2d = lax.stop_gradient(flat[:, 0:2])
        radius = lax.stop_gradient(flat[:, 10])
        rx, ry = pk.ellipse_radii(lax.stop_gradient(flat[:, 2:5]), radius)
        _, _, _, tc, total_unc = pk.tile_rects_xy(
            mean2d, rx, ry, tiles_y, tiles_x, pk.TILE, 63)
        span6 = jnp.clip(total_unc, 0, 63)
        slot = jnp.arange(n, dtype=jnp.int32)
        key = ((63 - span6) << 22) + slot
        cols = tuple(flat[:, c] for c in range(11))
        return pk.sort_rows_by_key(key, cols)

    def upto_span_sort(xyz, q, scale, opacity, color):
        cols_s = _span_sorted(_projected(xyz, q, scale, opacity, color))
        return sum(jnp.sum(c) for c in cols_s)

    def _expanded(cols_s):
        n = cols_s[0].shape[0]
        radius_s = lax.stop_gradient(cols_s[10])
        depth_s = lax.stop_gradient(cols_s[9])
        pair_props = [[] for _ in range(pk.NPROP)]
        pair_tile, pair_depth = [], []
        off = 0
        for k_c, cnt in cfg.span_schedule:
            m2 = jnp.stack([cols_s[0][off:off + cnt],
                            cols_s[1][off:off + cnt]], axis=-1)
            rad = radius_s[off:off + cnt]
            con = lax.stop_gradient(jnp.stack(
                [cols_s[c][off:off + cnt] for c in (2, 3, 4)], axis=-1))
            rx, ry = pk.ellipse_radii(con, rad)
            x_min, y_min, span_x, tc, tu = pk.tile_rects_xy(
                lax.stop_gradient(m2), rx, ry, tiles_y, tiles_x, pk.TILE,
                k_c)
            dx, dy = pk.expand_rect_offsets(jnp.maximum(span_x, 1), k_c)
            kk = jnp.arange(k_c, dtype=jnp.int32)
            live = kk[None, :] < tc[:, None]
            tid = (y_min[:, None] + dy) * tiles_x + (x_min[:, None] + dx)
            tid = jnp.where(live, tid, num_tiles)
            pair_tile.append(tid.reshape(-1))
            pair_depth.append(jnp.broadcast_to(
                depth_s[off:off + cnt, None], (cnt, k_c)).reshape(-1))
            for p in range(pk.NPROP):
                pair_props[p].append(jnp.broadcast_to(
                    cols_s[p][off:off + cnt, None], (cnt, k_c)).reshape(-1))
            off += cnt
        props9 = tuple(jnp.concatenate(p) for p in pair_props)
        tile_flat = jnp.concatenate(pair_tile).astype(jnp.float32)
        depth_flat = jnp.concatenate(pair_depth)
        return props9, tile_flat, depth_flat

    def upto_expand(xyz, q, scale, opacity, color):
        props9, tile_flat, depth_flat = _expanded(
            _span_sorted(_projected(xyz, q, scale, opacity, color)))
        return (sum(jnp.sum(p) for p in props9) + jnp.sum(tile_flat)
                + jnp.sum(depth_flat))

    def upto_pair_sort(xyz, q, scale, opacity, color):
        props9, tile_flat, depth_flat = _expanded(
            _span_sorted(_projected(xyz, q, scale, opacity, color)))
        p_in = tile_flat.shape[0]
        p_lim = min(int(cfg.pair_budget), p_in)
        p_chunks = -(-p_lim // pk.CHUNK)
        props3d, start, count = pk._pair_sort_pre(
            props9, tile_flat, depth_flat, p_chunks, num_tiles,
            cfg.max_per_tile)
        return (jnp.sum(props3d) + jnp.sum(start.astype(jnp.float32))
                + jnp.sum(count.astype(jnp.float32)))

    def full(xyz, q, scale, opacity, color):
        from gps_gaussian_tpu.kernels.rasterizer import rasterize_single
        img, aux = rasterize_single(
            xyz, q, scale, opacity, color, valid_j, view, proj, tfx, tfy,
            res, res, bg, cfg)
        return jnp.sum(img) + jnp.sum(aux.transmittance)

    def timed(name, f, grad: bool):
        if grad:
            g = jax.grad(lambda *a: f(*a), argnums=(0, 1, 2, 3, 4))

            def body(i, a):
                gs = g(a[0], a[1], a[2], a[3], a[4])
                return (a[0] + 1e-30 * gs[0],) + a[1:]
        else:
            def body(i, a):
                return (a[0] + 1e-30 * f(*a),) + a[1:]

        @jax.jit
        def run(n, a):
            return lax.fori_loop(0, n, body, a)

        times = {}
        for n in (2, 10):
            _ = float(run(n, A)[0][0, 0])
            t0 = time.perf_counter()
            _ = float(run(n, A)[0][0, 0])
            times[n] = time.perf_counter() - t0
        ms = (times[10] - times[2]) / 8 * 1e3
        print(f"{name:32s} {ms:8.2f} ms", flush=True)
        return ms

    print(f"== staircase splat ablation @{res}^2 (bench config) ==",
          flush=True)
    for grad in (False, True):
        tag = "fwd+bwd" if grad else "fwd"
        print(f"-- {tag} --", flush=True)
        timed("compact", upto_compact, grad)
        timed("+ project/stack", upto_project, grad)
        timed("+ span sort", upto_span_sort, grad)
        timed("+ rect expand", upto_expand, grad)
        timed("+ pair sort", upto_pair_sort, grad)
        timed("full (composite)", full, grad)


if __name__ == "__main__":
    main()
