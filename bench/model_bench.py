#!/usr/bin/env python
"""Per-stage timing of the model forward on the real chip.

Times cumulative prefixes of the GPS-Gaussian forward (encoder -> raft
-> geometry -> gsnet) with the chained-fori protocol from bench.py, and a
few isolated conv micro-shapes to pin MXU efficiency.

Usage: python bench/model_bench.py [--res 1024] [--iters 10]
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

    from gps_gaussian_tpu.models.encoders import (MultiBasicEncoder,
                                                  UnetExtractor)
    from gps_gaussian_tpu.models.gsnet import GSRegresser
    from gps_gaussian_tpu.models.raft import RaftStereoHuman
    from gps_gaussian_tpu.testing import fake_stereo_batch
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import make_model

    res = args.res
    dtype = jnp.bfloat16 if args.bf16 else None
    cfg = load_config(None, raft=dict(mixed_precision=args.bf16))
    batch = fake_stereo_batch(batch=1, res=res, novel_res=res)
    model = make_model(cfg, with_gs=True)
    params = model.init(jax.random.PRNGKey(0), batch, iters=3,
                        test_mode=True)

    image = jnp.concatenate([batch.lmain.img, batch.rmain.img], axis=0)
    if dtype is not None:
        image = image.astype(dtype)

    enc = UnetExtractor(dtype=dtype)
    enc_params = {"params": params["params"]["img_encoder"]}

    def encoder_only(img):
        f = enc.apply(enc_params, img)
        return f[0][0, 0, 0, 0].astype(jnp.float32)

    raft = RaftStereoHuman(dtype=dtype)
    raft_params = {"params": params["params"]["raft_stereo"]}

    def thru_raft(img):
        f = enc.apply(enc_params, img)
        preds = raft.apply(raft_params, f[2], iters=3, test_mode=True)
        return preds[-1][0, 0, 0, 0]

    def full_forward(img):
        b = batch.replace(
            lmain=batch.lmain.replace(img=img[:1]),
            rmain=batch.rmain.replace(img=img[1:]))
        out = model.apply(params, b, iters=3, test_mode=True)
        return out.lmain_gs.opacity[0, 0, 0, 0]

    gs = GSRegresser(dtype=dtype)
    gs_params = {"params": params["params"]["gs_regresser"]}
    depth_in = jnp.zeros((2, res, res, 1),
                         dtype or jnp.float32)

    def gsnet_only(img):
        f = enc.apply(enc_params, img)
        rot, scale, op = gs.apply(gs_params, img, depth_in, f)
        return op[0, 0, 0, 0]

    depth_enc = UnetExtractor(dtype=dtype)
    de_params = {"params": params["params"]["gs_regresser"]
                 ["depth_encoder"]}

    def depth_enc_only(img):
        f = depth_enc.apply(de_params, depth_in)
        return (f[0][0, 0, 0, 0] + 0.0 * img[0, 0, 0, 0]).astype(
            jnp.float32)

    print(f"== model stages @{res}^2, bf16={args.bf16} ==")
    prev = 0.0
    for name, fn in (("encoder", encoder_only), ("enc+raft", thru_raft),
                     ("depth_enc", depth_enc_only),
                     ("enc+gsnet", gsnet_only),
                     ("full_fwd", full_forward)):
        ms = timed_loop(lambda t, fn=fn: fn(t[0]), (image,))
        print(f"  {name:10s} {ms:8.2f} ms (delta {ms - prev:+8.2f})")
        prev = ms

    # conv micro-shapes: where does a small-channel conv land vs MXU peak?
    from flax import linen as nn

    for ch_in, ch_out, r in ((32, 32, res), (48, 48, res // 2),
                             (128, 128, res // 2), (52, 32, res)):
        conv = nn.Conv(ch_out, (3, 3), dtype=dtype)
        cp = conv.init(jax.random.PRNGKey(0),
                       jnp.zeros((2, r, r, ch_in), dtype or jnp.float32))
        x0 = jnp.ones((2, r, r, ch_in), dtype or jnp.float32)

        def one_conv(x, conv=conv, cp=cp):
            return conv.apply(cp, x)[0, 0, 0, 0].astype(jnp.float32)

        ms = timed_loop(lambda t, f=one_conv: f(t[0]), (x0,))
        flops = 2 * 2 * r * r * 9 * ch_in * ch_out
        print(f"  conv3x3 {ch_in:3d}->{ch_out:3d} @{r:4d}^2: {ms:7.3f} ms "
              f"= {flops / ms / 1e9:8.2f} TFLOP/s")


if __name__ == "__main__":
    main()
