#!/usr/bin/env python
"""RAFT-head sub-stage timings at 1/8 resolution (chained-fori protocol).

The model bench showed the RAFT head dominating the forward (~104 ms of
158 ms @1024^2) despite running at 1/8 res — this isolates cnet, corr
volume build, pyramid lookup, GRU update, and convex upsample.

Usage: python bench/raft_bench.py [--res 1024]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench.utils import timed_loop  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=1024)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gps_gaussian_tpu.models.encoders import MultiBasicEncoder
    from gps_gaussian_tpu.models.raft import RaftStereoHuman
    from gps_gaussian_tpu.models.update import BasicUpdateBlock
    from gps_gaussian_tpu.ops.corr import (build_corr_pyramid,
                                           lookup_corr_pyramid)
    from gps_gaussian_tpu.ops.sampling import convex_upsample, coords_grid

    res = args.res
    h = w = res // 8
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    key = jax.random.PRNGKey(0)
    fmap8 = jax.random.normal(key, (2, h, w, 96), dtype)

    cnet = MultiBasicEncoder(dtype=dtype if args.bf16 else None)
    cnet_p = cnet.init(key, fmap8)

    def cnet_only(x):
        (hid, ctx), f1, f2 = cnet.apply(cnet_p, x)
        return (hid[0, 0, 0, 0] + f1[0, 0, 0, 0]).astype(jnp.float32)

    (hid0, ctx0), f1_, f2_ = cnet.apply(cnet_p, fmap8)
    fmap12 = jnp.concatenate([f1_, f2_], axis=0)
    fmap21 = jnp.concatenate([f2_, f1_], axis=0)

    def corr_build(x):
        pyr = build_corr_pyramid(
            jnp.concatenate([x[:1] * 1.0, x[1:]], 0), fmap21,
            num_levels=4)
        return pyr[0][0, 0, 0, 0].astype(jnp.float32)

    pyr0 = build_corr_pyramid(fmap12, fmap21, num_levels=4)
    coords = coords_grid(2, h, w)[..., 0]

    def corr_lookup(x):
        c = lookup_corr_pyramid(pyr0, coords + 1e-30 * x[0, 0, 0, 0], 4)
        return c[0, 0, 0, 0].astype(jnp.float32)

    upd = BasicUpdateBlock(96)
    net0 = jnp.tanh(hid0.astype(jnp.float32)).astype(dtype)
    corr0 = lookup_corr_pyramid(pyr0, coords, 4).astype(dtype)
    flow0 = jnp.zeros((2, h, w, 2), dtype)
    czqr = jax.random.normal(key, (2, h, w, 96 * 3), dtype)
    cz, cr, cq = jnp.split(czqr, 3, axis=-1)
    upd_p = upd.init(key, net0, (cz, cr, cq), flow0, corr0)

    def update_only(x):
        net, mask, df = upd.apply(upd_p, net0 + 0.0 * x[0, 0, 0, 0], (cz, cr, cq),
                                  flow0, corr0)
        return (net[0, 0, 0, 0] + mask[0, 0, 0, 0]
                + df[0, 0, 0, 0]).astype(jnp.float32)

    mask0 = jax.random.normal(key, (2, h, w, 64 * 9), jnp.float32)

    def upsample_only(x):
        up = convex_upsample(flow0.astype(jnp.float32)
                             + 1e-30 * x[0, 0, 0, 0], mask0, 8)
        return up[0, 0, 0, 0]

    raft = RaftStereoHuman(dtype=dtype if args.bf16 else None)
    raft_p = raft.init(key, fmap8, iters=3, test_mode=True)

    def full_raft(x):
        preds = raft.apply(raft_p, x, iters=3, test_mode=True)
        return preds[-1][0, 0, 0, 0]

    print(f"== raft sub-stages @{res}^2 (1/8 = {h}x{w}), bf16={args.bf16} ==")
    for name, fn, inp in (
            ("cnet", cnet_only, fmap8),
            ("corr_build", corr_build, fmap12),
            ("corr_lookup", corr_lookup, fmap12),
            ("update_blk", update_only, fmap8),
            ("convex_up", upsample_only, fmap8),
            ("full_raft(3it)", full_raft, fmap8)):
        ms = timed_loop(lambda t, fn=fn: fn(t[0]), (inp,))
        print(f"  {name:15s} {ms:8.2f} ms")


if __name__ == "__main__":
    main()
