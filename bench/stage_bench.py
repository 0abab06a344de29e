#!/usr/bin/env python
"""Per-stage timing of the splat pipeline on the real chip.

Times each stage of rasterize_single's pallas path in isolation with the
chained-fori protocol from bench.py (tunnel-safe).  Run with no args for the
default 1024^2 production scene.
"""

from __future__ import annotations

import argparse
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from bench.utils import timed_loop  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--stages", type=str, default="all")
    args_cli = ap.parse_args()

    import importlib.util
    spec = importlib.util.spec_from_file_location("root_bench",
                                                  "/root/repo/bench.py")
    root_bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(root_bench)

    from gps_gaussian_tpu.geometry import cameras
    from gps_gaussian_tpu.kernels.rasterizer import RasterizeConfig
    from gps_gaussian_tpu.kernels.rasterizer import pallas_kernel as PK
    from gps_gaussian_tpu.kernels.rasterizer import preprocess as PP

    res = args_cli.res
    xyz, q, scale, opacity, color, valid = root_bench.build_scene(res)
    K = np.array([[0.8 * res, 0, res / 2],
                  [0, 0.8 * res, res / 2 + 25], [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    E[1, 3] = -0.85
    E[2, 3] = 2.0
    cam = cameras.camera_from_intr_extr(K, E, res, res)

    cfg = RasterizeConfig(max_tiles_per_gaussian=8, max_per_tile=2048,
                          fg_cap=400_000, pair_budget=1_572_864,
                          backend="pallas")
    xyz = jnp.asarray(xyz); q = jnp.asarray(q); scale = jnp.asarray(scale)
    opacity = jnp.asarray(opacity); color = jnp.asarray(color)
    valid = jnp.asarray(valid)
    view = jnp.asarray(cam["view"]); proj = jnp.asarray(cam["proj"])
    tfx, tfy = cam["tanfovx"], cam["tanfovy"]
    bg = jnp.zeros(3, jnp.float32)

    def preprocess(xyz, q, scale, opacity, color):
        return PP.project_gaussians(xyz, q, scale, opacity, color, valid,
                                    view, proj, tfx, tfy, res, res)

    tiles_y, tiles_x = PK._grids(res, res)
    num_tiles = tiles_y * tiles_x

    def stack_and_compact(projd):
        n = projd.depth.shape[0]
        stacked = PK.stack_rows(projd.mean2d, projd.conic, projd.opacity,
                                projd.color, projd.depth, projd.radius)
        live = projd.radius > 0.0
        order = jnp.argsort(jnp.logical_not(live))
        idx_map = order[: cfg.fg_cap]
        n_live = jnp.sum(live.astype(jnp.int32))
        n_kept = jnp.minimum(n_live, cfg.fg_cap)
        slot_live = (jnp.arange(cfg.fg_cap, dtype=jnp.int32)
                     < n_kept).astype(jnp.float32)
        stacked = PK.take_rows_unique(stacked, idx_map.astype(jnp.float32))
        stacked = jnp.concatenate(
            [stacked[:, :10], stacked[:, 10:11] * slot_live[:, None],
             stacked[:, 11:]], axis=1)
        return stacked

    def sort_stage(stacked):
        n = stacked.shape[0]
        K = cfg.max_tiles_per_gaussian
        x_min, y_min, span_x, total, _ = PK.tile_rects(
            stacked[:, 0:2], stacked[:, 10], tiles_y, tiles_x, PK.TILE, K)
        k = jnp.arange(K, dtype=jnp.int32)
        span_x_safe = jnp.maximum(span_x, 1)[:, None]
        dxk = k[None, :] % span_x_safe
        dyk = k[None, :] // span_x_safe
        pair_live = k[None, :] < total[:, None]
        tile_id = (y_min[:, None] + dyk) * tiles_x + (x_min[:, None] + dxk)
        tile_id = jnp.where(pair_live, tile_id, num_tiles)
        p_chunks = -(-min(cfg.pair_budget, n * K) // PK.CHUNK)
        depth_b = jnp.broadcast_to(stacked[:, 9][:, None],
                                   (n, K)).reshape(-1)
        return PK._pair_sort(stacked,
                             tile_id.reshape(-1).astype(jnp.float32),
                             depth_b, K, p_chunks, num_tiles,
                             cfg.max_per_tile)

    def kernel_stage(props3d, start_f, count_f):
        return PK._composite_core(props3d, start_f, count_f, 1,
                                  tiles_y, tiles_x, False)

    stages = {}

    # ---- forward stage timings (each includes all prior stages; report
    # deltas at the end) ----
    def upto_preprocess(x5):
        p = preprocess(*x5)
        return p.mean2d[0, 0] + p.depth[0] + p.conic[0, 0]

    def upto_stack(x5):
        s = stack_and_compact(preprocess(*x5))
        return s[0, 0]

    def upto_sort(x5):
        s = stack_and_compact(preprocess(*x5))
        props3d, start_f, count_f = sort_stage(s)
        return props3d[0, 0, 0] + start_f[0] + count_f[0]

    def upto_kernel(x5):
        s = stack_and_compact(preprocess(*x5))
        props3d, start_f, count_f = sort_stage(s)
        out = kernel_stage(props3d, start_f, count_f)
        return out[0, 0, 0] + out[0, 0, 3]

    fwd_stages = [("preprocess", upto_preprocess), ("stack", upto_stack),
                  ("sort", upto_sort), ("kernel", upto_kernel)]

    x5 = (xyz, q, scale, opacity, color)
    prev = 0.0
    print("== forward cumulative (delta) ==")
    for name, fn in fwd_stages:
        ms = timed_loop(fn, x5)
        print(f"  {name:12s} {ms:8.2f} ms  (delta {ms - prev:+7.2f})")
        stages[name] = ms
        prev = ms

    # ---- backward through the full pipeline, and through pipeline minus
    # kernel (glue-only AD) ----
    def loss_full(*x5):
        s = stack_and_compact(preprocess(*x5))
        props3d, start_f, count_f = sort_stage(s)
        out = kernel_stage(props3d, start_f, count_f)
        return jnp.sum(out)

    def loss_to_props(*x5):
        s = stack_and_compact(preprocess(*x5))
        props3d, start_f, count_f = sort_stage(s)
        return jnp.sum(props3d)

    def loss_to_stack(*x5):
        s = stack_and_compact(preprocess(*x5))
        return jnp.sum(s)

    def loss_to_pre(*x5):
        p = preprocess(*x5)
        return (jnp.sum(p.mean2d) + jnp.sum(p.conic) + jnp.sum(p.opacity)
                + jnp.sum(p.color))

    print("== fwd+bwd cumulative ==")
    for name, fn in [("grad_pre", loss_to_pre), ("grad_stack", loss_to_stack),
                     ("grad_props", loss_to_props), ("grad_full", loss_full)]:
        g = jax.grad(fn, argnums=(0, 1, 2, 3, 4))

        def run(x5v, g=g):
            gg = g(*x5v)
            return gg[0][0, 0]

        ms = timed_loop(run, x5)
        print(f"  {name:12s} {ms:8.2f} ms")
        stages[name] = ms


if __name__ == "__main__":
    main()
