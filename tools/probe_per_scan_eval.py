"""Per-val-scan PSNR of a stage-2 checkpoint — disambiguates sweep-mean
movement (trainer run_eval) from the 2-sample probe batch (probe_photo_only
used only the first eval batch = scans 1000-1001).

Usage: python tools/probe_per_scan_eval.py --ckpt experiments/s2r5/ckpt
"""
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
import argparse  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", required=True)
    ap.add_argument("--config",
                    default=str(_REPO / "configs/stage2_synth256.yaml"))
    ap.add_argument("--data-root", default=str(_REPO / "data/synth256"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gps_gaussian_tpu.data.loader import collate
    from gps_gaussian_tpu.data.thuman import (DatasetConfig,
                                              StereoHumanDataset)
    from gps_gaussian_tpu.train import losses
    from gps_gaussian_tpu.train import state as state_lib
    from gps_gaussian_tpu.train import trainer as T
    from gps_gaussian_tpu.train.config import load_config

    cfg = load_config(args.config, stage="stage2",
                      **{"dataset": {"data_root": args.data_root}})
    ds_cfg = DatasetConfig(data_root=cfg.dataset.data_root, src_res=256,
                           source_ids=(0, 1), train_novel_ids=(2, 3, 4),
                           val_novel_ids=(3,), use_hr_img=True,
                           use_processed_data=True, znear=0.01, zfar=100.0)
    vds = StereoHumanDataset(ds_cfg, "val")
    model = T.make_model(cfg, with_gs=True)
    rcfg = T.make_raster_config(cfg)
    bg = jnp.zeros(3, jnp.float32)

    sample0 = collate([vds.get_sample(0, (3,))])
    params = jax.jit(lambda k, b: model.init(k, b, iters=3))(
        jax.random.PRNGKey(1314), sample0)
    params, n = state_lib.restore_params_partial(args.ckpt, params)
    print(f"restored {n} leaves from {args.ckpt}", flush=True)

    @jax.jit
    def scan_metrics(params, batch):
        out = model.apply(params, batch, iters=3, test_mode=True)
        img_pred, _ = T.render_novel(out, batch.novel, bg, rcfg)
        flow_gt = jnp.concatenate([batch.lmain.flow, batch.rmain.flow], 0)
        valid = jnp.concatenate([batch.lmain.valid, batch.rmain.valid], 0)
        epe = jnp.sqrt(jnp.sum((out.final_flow - flow_gt) ** 2, -1))
        vm = (valid >= 0.5).astype(jnp.float32)[..., 0]
        return (losses.psnr(img_pred, batch.novel.img).mean(),
                losses.l1_loss(img_pred, batch.novel.img),
                (epe * vm).sum() / vm.sum())

    for i in range(len(vds)):
        batch = jax.tree.map(jnp.asarray, collate([vds.get_sample(i, (3,))]))
        p, l1, epe = scan_metrics(params, batch)
        print(f"val scan {i}: psnr {float(p):6.2f}  l1 {float(l1):.4f}  "
              f"epe {float(epe):.3f}", flush=True)


if __name__ == "__main__":
    main()
