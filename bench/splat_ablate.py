#!/usr/bin/env python
"""Stage-by-stage attribution of the splat fwd+bwd time at 1024^2.

Times nested prefixes of the pallas rasterizer pipeline (compact ->
project -> stack -> pair-sort -> composite kernel), forward and
forward+backward, with the chained-fori tunnel-safe protocol from
bench.py.  Deltas between rows attribute time to each stage (including
its VJP).

Usage: python bench/splat_ablate.py [--res 1024]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "headline_bench", Path(__file__).resolve().parent.parent / "bench.py")
    headline = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(headline)
    build_scene = headline.build_scene  # reuse the headline scene
    from gps_gaussian_tpu.geometry import cameras
    from gps_gaussian_tpu.kernels.rasterizer import (
        RasterizeConfig, compact_gaussian_inputs, _stack_rows)
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import (
        render_sorted)
    from gps_gaussian_tpu.kernels.rasterizer.preprocess import (
        project_gaussians)

    res = args.res
    import numpy as np
    xyz, q, scale, opacity, color, valid = build_scene(res)
    K = np.array([[0.8 * res, 0, res / 2],
                  [0, 0.8 * res, res / 2 + 25], [0, 0, 1]], np.float32)
    E = np.eye(3, 4, dtype=np.float32)
    E[1, 3] = -0.85
    E[2, 3] = 2.0
    cam = cameras.camera_from_intr_extr(K, E, res, res)
    cfg = RasterizeConfig(max_tiles_per_gaussian=8, max_per_tile=2048,
                          fg_cap=352_256, pair_budget=1_572_864)
    view = jnp.asarray(cam["view"])
    proj = jnp.asarray(cam["proj"])
    tfx, tfy = cam["tanfovx"], cam["tanfovy"]
    bg = jnp.zeros(3, jnp.float32)
    inputs = tuple(jnp.asarray(a) for a in
                   (xyz, q, scale, opacity, color))
    validj = jnp.asarray(valid)

    def stage_compact(xyz, q, scale, opacity, color):
        (xyz, q, scale, opacity, color, v2), nd = compact_gaussian_inputs(
            xyz, q, scale, opacity, color, validj, cfg.fg_cap)
        return (xyz, q, scale, opacity, color, v2)

    def stage_project(xyz, q, scale, opacity, color):
        c = stage_compact(xyz, q, scale, opacity, color)
        projd = project_gaussians(*c, view, proj, tfx, tfy, res, res)
        return _stack_rows(projd)

    def stage_full(xyz, q, scale, opacity, color):
        stacked = stage_project(xyz, q, scale, opacity, color)
        img, trans, nd, npd = render_sorted(
            stacked[None], res, res, cfg.max_tiles_per_gaussian,
            cfg.max_per_tile, cfg.pair_budget, bg)
        return img, trans

    def as_scalar(out):
        return sum(jnp.sum(o) for o in jax.tree_util.tree_leaves(out))

    def timed(name, f, grad: bool):
        if grad:
            g = jax.grad(lambda *a: as_scalar(f(*a)), argnums=(0, 1, 2, 3, 4))

            def body(i, a):
                gs = g(*a)
                return tuple(x + 1e-30 * y for x, y in zip(a, gs))
        else:
            def body(i, a):
                s = as_scalar(f(*a))
                return tuple(x + 1e-30 * s for x in a)

        @jax.jit
        def run(n, a):
            return lax.fori_loop(0, n, body, a)

        ts = {}
        for n in (1, 6):
            _ = float(run(n, inputs)[0].ravel()[0])
            t0 = time.perf_counter()
            _ = float(run(n, inputs)[0].ravel()[0])
            ts[n] = time.perf_counter() - t0
        ms = (ts[6] - ts[1]) / 5 * 1e3
        print(f"{name:34s} {ms:8.2f} ms", flush=True)
        return ms

    print(f"== splat ablation @{res}^2 ==")
    timed("compact                 fwd", stage_compact, False)
    timed("compact                 f+b", stage_compact, True)
    timed("compact+project+stack   fwd", stage_project, False)
    timed("compact+project+stack   f+b", stage_project, True)
    timed("full (sort+kernel)      fwd", stage_full, False)
    timed("full (sort+kernel)      f+b", stage_full, True)


if __name__ == "__main__":
    main()
