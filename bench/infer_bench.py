#!/usr/bin/env python
"""Freeview inference fps: stereo forward once, render per novel view.

The headline capability of the reference is ~25 FPS full-pipeline novel
view synthesis at 2K on an RTX 3090 (BASELINE.md).  This measures both the
full-pipeline fps (forward + render) and the render-only fps that governs
freeview sweeps (our split runs the stereo forward once per frame).

Usage: python bench/infer_bench.py [--res 1024] [--iters 10]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--hr", action="store_true",
                    help="render the 2x hi-res novel target from --res "
                         "sources (the reference's 2K claim)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gps_gaussian_tpu.kernels.rasterizer import (RasterizeConfig,
                                                     rasterize)
    from gps_gaussian_tpu.testing import fake_stereo_batch
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import make_model

    res = args.res
    novel_res = res * 2 if args.hr else res
    cfg = load_config(None, raft=dict(mixed_precision=True))
    batch = fake_stereo_batch(batch=1, res=res, novel_res=novel_res)
    model = make_model(cfg, with_gs=True)
    params = model.init(jax.random.PRNGKey(0), batch, iters=3,
                        test_mode=True)
    from gps_gaussian_tpu.infer.freeview import compact_valid

    fg_cap = max(res * res // 4, 1 << 14)
    # compaction runs once per frame in the forward (freeview split);
    # per-view rendering skips its own fg compaction
    rcfg = RasterizeConfig(max_tiles_per_gaussian=16 if args.hr else 8,
                           max_per_tile=4096 if args.hr else 2048,
                           pair_budget=3 * novel_res * novel_res // 2)

    def forward(batch_img_l, batch_img_r):
        b = batch.replace(lmain=batch.lmain.replace(img=batch_img_l),
                          rmain=batch.rmain.replace(img=batch_img_r))
        out = model.apply(params, b, iters=3, test_mode=True)
        gauss = out.lmain_gs.flatten().concat(out.rmain_gs.flatten())
        return compact_valid(gauss, fg_cap)[0]

    def render(gauss):
        return rasterize(gauss, batch.novel.camera, jnp.zeros(3), rcfg)[0]

    # tunnel-safe two-point chained loops (see bench.py); a traced loop
    # bound keeps it to ONE compile per benchmark
    def time_loop(body_chain, init, reps=(1, 1 + args.iters)):
        @jax.jit
        def run(x, n):
            return jax.lax.fori_loop(0, n, body_chain, x)
        times = {}
        for n in reps:
            out = run(init, n)
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            t0 = time.perf_counter()
            out = run(init, n)
            _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
            times[n] = time.perf_counter() - t0
        return (times[reps[1]] - times[reps[0]]) / (reps[1] - reps[0]) * 1e3

    def full_body(i, imgs):
        l, r = imgs
        gauss = forward(l, r)
        img = render(gauss)
        eps = 1e-30 * img[0, 0, 0, 0]
        return (l + eps, r + eps)

    full_ms = time_loop(full_body, (batch.lmain.img, batch.rmain.img))

    gauss0 = jax.jit(forward)(batch.lmain.img, batch.rmain.img)

    def render_body(i, g):
        img = render(g)
        return g.replace(xyz=g.xyz + 1e-30 * img[0, 0, 0, 0])

    render_ms = time_loop(render_body, gauss0)

    print(json.dumps({
        "metric": (f"freeview_fps_{res}"
                   + (f"_hr{novel_res}" if args.hr else "")),
        "value": round(1000.0 / full_ms, 2),
        "unit": "fps",
        "vs_baseline": round((1000.0 / full_ms) / 25.0, 3),
        "full_ms": round(full_ms, 1),
        "render_only_ms": round(render_ms, 1),
        "render_only_fps": round(1000.0 / render_ms, 2),
    }))


if __name__ == "__main__":
    main()
