#!/usr/bin/env python
"""Op-level breakdown of the gsnet decoder (VERDICT r3 weak #2: ~26 ms of
the 57 ms model forward @1024^2 sits in the decoder).

Times each decoder stage in isolation with the chained-fori tunnel
protocol (bench/utils.py), plus microbenches of the suspected costs:
GroupNorm-in-f32 at the decoder shapes, `jax.image.resize` 2x upsampling,
and the full-res head tail.

Usage: python bench/gsnet_bench.py [--res 1024] [--no-bf16]
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

    from gps_gaussian_tpu.models.gsnet import GSRegresser, _up2
    from gps_gaussian_tpu.models.layers import (Conv, GroupNorm32,
                                                ResidualBlock)

    res = args.res
    dtype = jnp.bfloat16 if args.bf16 else None
    rdt = dtype or jnp.float32
    key = jax.random.PRNGKey(0)

    # gsnet with the production dims (config.py gsnet defaults)
    gs = GSRegresser(rgb_dims=(32, 48, 96), depth_dims=(32, 48, 96),
                     decoder_dims=(48, 64, 96), head_dim=32, dtype=dtype)
    img = jnp.zeros((2, res, res, 3), rdt)
    depth = jnp.zeros((2, res, res, 1), rdt)
    feats = (jnp.zeros((2, res // 2, res // 2, 32), rdt),
             jnp.zeros((2, res // 4, res // 4, 48), rdt),
             jnp.zeros((2, res // 8, res // 8, 96), rdt))
    params = gs.init(key, img, depth, feats)

    def full(t):
        rot, scale, op = gs.apply(params, t[0], t[1], t[2:])
        return op[0, 0, 0, 0]

    ms_full = timed_loop(lambda t: full(t), (img, depth) + feats)
    print(f"== gsnet @{res}^2 bf16={args.bf16}: full {ms_full:.2f} ms ==")

    # ---- stage isolation: one ResidualBlock pair per decoder scale ----
    sub = {"params": params["params"]}

    def block_pair(x, a, b, planes):
        blk_a = ResidualBlock(planes, 1, "group", dtype)
        blk_b = ResidualBlock(planes, 1, "group", dtype)
        pa = {"params": sub["params"][a]}
        pb = {"params": sub["params"][b]}
        y = blk_a.apply(pa, x)
        return blk_b.apply(pb, y)

    shapes = {
        "dec3 (1/8, 192->96)": ((2, res // 8, res // 8, 192),
                                ("dec3a", "dec3b", 96)),
        "dec2 (1/4, 160->64)": ((2, res // 4, res // 4, 96 + 48 + 16),
                                ("dec2a", "dec2b", 64)),
        "dec1 (1/2, 128->48)": ((2, res // 2, res // 2, 64 + 32 + 32),
                                ("dec1a", "dec1b", 48)),
    }
    for name, (shape, (a, b, planes)) in shapes.items():
        x = jnp.zeros(shape, rdt)
        # dec2/dec1 input channel counts must match the trained params
        want = sub["params"][a]["conv1"]["Conv_0"]["kernel"].shape[2]
        if shape[-1] != want:
            x = jnp.zeros(shape[:-1] + (want,), rdt)
        ms = timed_loop(lambda t, a=a, b=b, p=planes: block_pair(
            t[0], a, b, p)[0, 0, 0, 0].astype(jnp.float32), (x,))
        print(f"  {name:24s} {ms:7.2f} ms")

    # ---- full-res tail: up2 + concat + out_conv + fused head ----
    up1 = jnp.zeros((2, res // 2, res // 2, 48), rdt)

    def tail(t):
        u = _up2(t[0])
        out = jnp.concatenate([u, t[1].astype(u.dtype),
                               t[2].astype(u.dtype)], axis=-1)
        oc = Conv(32, 3, 1, 1, dtype=dtype)
        h = jax.nn.relu(oc.apply(
            {"params": sub["params"]["out_conv"]}, out))
        hc = Conv(96, 3, 1, 1, dtype=dtype)
        h1 = jax.nn.relu(hc.apply(
            {"params": sub["params"]["head_conv1"]}, h))
        return h1[0, 0, 0, 0].astype(jnp.float32)

    try:
        ms = timed_loop(lambda t: tail(t), (up1, img, depth))
        print(f"  full-res tail (up2+out+head) {ms:7.2f} ms")
    except Exception as e:  # param path mismatch — report, keep going
        print(f"  full-res tail: skipped ({type(e).__name__}: {e})")

    # ---- microbenches ----
    for name, shape in (("GN f32 @1/2-res 48ch", (2, res // 2, res // 2,
                                                  48)),
                        ("GN f32 @full-res 32ch", (2, res, res, 32))):
        gn = GroupNorm32(num_groups=shape[-1] // 8)
        x = jnp.ones(shape, rdt)
        gp = gn.init(key, x)
        ms = timed_loop(lambda t, gn=gn, gp=gp: gn.apply(
            gp, t[0])[0, 0, 0, 0].astype(jnp.float32), (x,))
        print(f"  {name:28s} {ms:7.3f} ms")

    x = jnp.ones((2, res // 2, res // 2, 48), rdt)
    ms = timed_loop(lambda t: _up2(t[0])[0, 0, 0, 0].astype(jnp.float32),
                    (x,))
    print(f"  up2 resize 48ch 1/2->full     {ms:7.3f} ms")

    relu = jax.nn.relu
    x = jnp.ones((2, res, res, 32), rdt)
    ms = timed_loop(lambda t: relu(t[0] * 1.0001)[0, 0, 0, 0].astype(
        jnp.float32), (x,))
    print(f"  elementwise @full-res 32ch    {ms:7.3f} ms "
          f"(pure lane-padded traffic floor)")


if __name__ == "__main__":
    main()
