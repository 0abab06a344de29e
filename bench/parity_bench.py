#!/usr/bin/env python
"""PSNR-parity harness: the LIVE reference network vs this framework on the
same synthetic scenes, weight-for-weight.

The reference's released checkpoints need THuman2.0 (not redistributable)
and its rasterizer needs CUDA, so the closest measurable proxy to the
"reference-matching PSNR" north star (BASELINE.md) is:

  1. build the actual reference torch model (imported read-only from
     /root/reference), with its own torch initialisation;
  2. convert the weights with utils/torch_import.convert_state_dict;
  3. run BOTH pipelines on identical synthetic stereo scenes (our offline
     renderer's output distribution) and splat both models' Gaussian maps
     into the same novel cameras with OUR rasterizer (the reference's is
     CUDA-only; ours is validated against an independent walk of the CUDA
     semantics in tests/test_rasterizer.py);
  4. report PSNR/SSIM between the two renders, plus disparity EPE — the
     number a released-checkpoint comparison would produce on the model
     side.

Runs on CPU. Prints one JSON line.
Usage: python bench/parity_bench.py [--res 128] [--scenes 2] [--views 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import types
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

REF = "/root/reference"


def _ref_cfg():
    raft = types.SimpleNamespace(
        mixed_precision=False, train_iters=3, val_iters=3,
        corr_implementation="reg", corr_levels=4, corr_radius=4,
        n_downsample=3, n_gru_layers=1, slow_fast_gru=False,
        encoder_dims=[32, 48, 96], hidden_dims=[96, 96, 96])
    gsnet = types.SimpleNamespace(encoder_dims=[32, 48, 96],
                                  decoder_dims=[48, 64, 96],
                                  parm_head_dim=32)
    return types.SimpleNamespace(raft=raft, gsnet=gsnet)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--seed", type=int, default=1314)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp

    if jax.default_backend() not in ("cpu",):
        jax.config.update("jax_platforms", "cpu")

    import torch

    if REF not in sys.path:
        sys.path.insert(0, REF)
    from lib.network import RtStereoHumanModel

    from gps_gaussian_tpu.data import synth
    from gps_gaussian_tpu.data.loader import collate
    from gps_gaussian_tpu.data.thuman import DatasetConfig, StereoHumanDataset
    from gps_gaussian_tpu.kernels.rasterizer import (RasterizeConfig,
                                                     rasterize)
    from gps_gaussian_tpu.train import losses
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import make_model
    from gps_gaussian_tpu.utils.containers import FlatGaussians, GaussianMaps
    from gps_gaussian_tpu.utils.torch_import import convert_state_dict

    torch.manual_seed(args.seed)
    tmodel = RtStereoHumanModel(_ref_cfg(), with_gs_render=True)
    tmodel.eval()
    sd = {k: v.numpy() for k, v in tmodel.state_dict().items()}
    variables = convert_state_dict(sd)

    cfg = load_config(None, dataset=dict(src_res=args.res))
    model = make_model(cfg, with_gs=True)
    rcfg = RasterizeConfig(max_tiles_per_gaussian=16, max_per_tile=1024,
                           backend="jnp")
    bg = jnp.zeros(3, jnp.float32)

    with tempfile.TemporaryDirectory() as tmp:
        synth.generate_dataset(tmp, n_train=0, n_val=args.scenes,
                               res=args.res, hr=False, seed=args.seed)
        ds = StereoHumanDataset(
            DatasetConfig(data_root=tmp, src_res=args.res,
                          use_processed_data=False), "val")

        psnrs, ssims, epes = [], [], []
        for idx in range(min(args.scenes, len(ds))):
            rng = np.random.default_rng(args.seed + idx)
            for vi in range(args.views):
                novel_id = 2 + (vi % 3)
                sample = ds.get_sample(idx, (novel_id,), rng)
                batch = collate([sample])

                # --- reference forward (torch, NCHW dict) ---
                ref_data = {"lmain": {}, "rmain": {}}
                for key, view, other in (("lmain", batch.lmain,
                                          batch.rmain),
                                         ("rmain", batch.rmain,
                                          batch.lmain)):
                    d = ref_data[key]
                    d["img"] = torch.from_numpy(
                        np.asarray(view.img)).permute(0, 3, 1, 2)
                    d["mask"] = torch.from_numpy(
                        np.asarray(view.mask)).permute(0, 3, 1, 2)
                    d["intr"] = torch.from_numpy(np.asarray(view.intr))
                    d["ref_intr"] = torch.from_numpy(
                        np.asarray(view.ref_intr))
                    d["extr"] = torch.from_numpy(np.asarray(view.extr))
                    d["Tf_x"] = torch.from_numpy(np.asarray(view.tf_x))
                with torch.no_grad():
                    ref_out, _, _ = tmodel(ref_data, is_train=False)

                # --- our forward ---
                out = model.apply(variables, batch, iters=3,
                                  test_mode=True)

                # disparity EPE between the two pipelines
                for i, key in enumerate(("lmain", "rmain")):
                    rf = ref_out[key]["flow_pred"].numpy()[:, 0]
                    of = np.asarray(out.final_flow[i:i + 1, ..., 0])
                    epes.append(float(np.abs(rf - of).mean()))

                # --- splat BOTH models' gaussians with our rasterizer ---
                def to_gauss(lm, rm):
                    return lm.flatten().concat(rm.flatten())

                ours_img, _ = rasterize(
                    to_gauss(out.lmain_gs, out.rmain_gs),
                    batch.novel.camera, bg, rcfg)

                def ref_maps(key, i):
                    view = batch.lmain if key == "lmain" else batch.rmain
                    t = ref_out[key]
                    nchw = lambda x: jnp.asarray(   # noqa: E731
                        x.numpy().transpose(0, 2, 3, 1))
                    xyz = jnp.asarray(t["xyz"].numpy())       # (1, N, 3)
                    hw = args.res
                    return GaussianMaps(
                        xyz=xyz.reshape(1, hw, hw, 3),
                        rgb=nchw(ref_data[key]["img"]) * 0.5 + 0.5,
                        rot=nchw(t["rot_maps"]),
                        scale=nchw(t["scale_maps"]),
                        opacity=nchw(t["opacity_maps"]),
                        valid=(nchw(t["depth"]) != 0.0
                               ).astype(jnp.float32)[..., 0],
                        depth=nchw(t["depth"]))

                ref_img, _ = rasterize(
                    to_gauss(ref_maps("lmain", 0), ref_maps("rmain", 1)),
                    batch.novel.camera, bg, rcfg)

                psnrs.append(float(losses.psnr(ours_img, ref_img).mean()))
                ssims.append(float(losses.ssim(ours_img, ref_img)))

    report = {
        "metric": "parity_psnr_db",
        "value": round(float(np.mean(psnrs)), 2),
        "unit": "dB",
        "vs_baseline": None,
        "min_psnr_db": round(float(np.min(psnrs)), 2),
        "mean_ssim": round(float(np.mean(ssims)), 4),
        "mean_epe_px": round(float(np.mean(epes)), 5),
        "scenes": args.scenes, "views": args.views, "res": args.res,
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
