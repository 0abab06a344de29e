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

    import bench as bench_root  # repo-root bench.py
    import importlib.util
    spec = importlib.util.spec_from_file_location("root_bench",
                                                  "/root/repo/bench.py")
    root_bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(root_bench)

    from gps_gaussian_tpu.geometry import cameras
    from gps_gaussian_tpu.kernels.rasterizer import RasterizeConfig
    from gps_gaussian_tpu.kernels.rasterizer import binning as B
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

    def stack_and_compact(projd):
        n = projd.depth.shape[0]
        stacked = PK.stack_rows(
            projd.mean2d, projd.conic, projd.opacity, projd.color,
            extra=jnp.stack([projd.depth, projd.radius], axis=1))
        live = projd.radius > 0.0
        order = jnp.argsort(jnp.logical_not(live))
        idx_map = order[: cfg.fg_cap]
        n_live = jnp.sum(live.astype(jnp.int32))
        n_kept = jnp.minimum(n_live, cfg.fg_cap)
        slot_live = (jnp.arange(cfg.fg_cap, dtype=jnp.int32)
                     < n_kept).astype(jnp.float32)
        stacked = PK.take_rows_unique(stacked, idx_map.astype(jnp.float32))
        stacked = jnp.concatenate(
            [stacked[:, :11], stacked[:, 11:12] * slot_live[:, None],
             stacked[:, 12:]], axis=1)
        return stacked

    def bin_stage(stacked):
        return B.bin_gaussians(stacked[:, 0:2], stacked[:, 10],
                               stacked[:, 11], res, res, cfg.tile,
                               cfg.max_tiles_per_gaussian)

    def pad_stage(bins):
        return PK.pad_segments(bins.sorted_tile, bins.pair_slot,
                               cfg.max_tiles_per_gaussian, bins.pair_valid,
                               bins.tile_start, bins.tile_count,
                               cfg.max_per_tile, cfg.pair_budget)

    def pack_stage(stacked, seg):
        return PK.pack_stacked(stacked, seg, cfg.max_tiles_per_gaussian)

    def kernel_stage(props, seg):
        return PK._composite_from_props(props, seg, res // 16, res // 16,
                                        res, res, bg, False)

    stages = {}

    # ---- forward stage timings (each includes all prior stages; report
    # deltas at the end) ----
    def upto_preprocess(x5):
        p = preprocess(*x5)
        return p.mean2d[0, 0] + p.depth[0] + p.conic[0, 0]

    def upto_stack(x5):
        s = stack_and_compact(preprocess(*x5))
        return s[0, 0]

    def upto_bin(x5):
        s = stack_and_compact(preprocess(*x5))
        b = bin_stage(s)
        return s[0, 0] + b.tile_start[0].astype(jnp.float32)

    def upto_pad(x5):
        s = stack_and_compact(preprocess(*x5))
        seg = pad_stage(bin_stage(s))
        return s[0, 0] + seg.tile_start[0].astype(jnp.float32)

    def upto_pack(x5):
        s = stack_and_compact(preprocess(*x5))
        seg = pad_stage(bin_stage(s))
        props = pack_stage(s, seg)
        return props[0, 0] + seg.tile_start[0].astype(jnp.float32)

    def upto_kernel(x5):
        s = stack_and_compact(preprocess(*x5))
        seg = pad_stage(bin_stage(s))
        props = pack_stage(s, seg)
        img, tr = kernel_stage(props, seg)
        return img[0, 0, 0] + tr[0, 0, 0]

    fwd_stages = [("preprocess", upto_preprocess), ("stack", upto_stack),
                  ("bin", upto_bin), ("pad", upto_pad), ("pack", upto_pack),
                  ("kernel", upto_kernel)]

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
        seg = pad_stage(bin_stage(s))
        props = pack_stage(s, seg)
        img, tr = kernel_stage(props, seg)
        return jnp.sum(img) + jnp.sum(tr)

    def loss_to_props(*x5):
        s = stack_and_compact(preprocess(*x5))
        seg = pad_stage(bin_stage(s))
        props = pack_stage(s, seg)
        return jnp.sum(props)

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
