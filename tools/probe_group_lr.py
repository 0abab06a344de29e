"""Diagnostic: stage-2 full loss (flow + photometric) with per-group lr.

Round-4 finding: with a single lr the flow-dominated gradient drags the
shared image encoder out from under the fresh gsnet heads and opacity
collapses globally (val PSNR 33 -> 23 dB in 300 steps on synth-256; see
tools/probe_photo_only.py for the photometric-only control that climbs).
This probe runs the REAL train step (trainer.make_train_step) with
cfg.lr_group_scales downweighting the pretrained backbone, and logs val
PSNR every 50 steps.

Usage: python tools/probe_group_lr.py [--steps 300] [--backbone-scale 0.1]
       [--lr 5e-5]
"""
import sys
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))
import argparse  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--backbone-scale", type=float, default=0.1)
    ap.add_argument("--encoder-scale", type=float, default=None,
                    help="separate scale for the shared img_encoder "
                         "(default: same as --backbone-scale)")
    ap.add_argument("--lr", type=float, default=5e-5)
    ap.add_argument("--flow-weight", type=float, default=None,
                    help="override cfg.flow_weight (reference: 1.0)")
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--no-donate", action="store_true",
                    help="jit the train step WITHOUT donate_argnums "
                         "(bisecting a trainer-vs-probe trajectory "
                         "divergence)")
    ap.add_argument("--bare-metrics", action="store_true",
                    help="replace make_train_step with a minimal "
                         "photometric-only step (no flow/drop metrics in "
                         "the jitted program) using the same TrainState")
    ap.add_argument("--config",
                    default=str(_REPO / "configs/stage2_synth256.yaml"))
    ap.add_argument("--data-root", default=str(_REPO / "data/synth256"))
    ap.add_argument("--stage1-ckpt",
                    default=str(_REPO / "runs/synth256/stage1"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gps_gaussian_tpu.data.loader import BatchLoader, eval_batches
    from gps_gaussian_tpu.data.thuman import DatasetConfig, StereoHumanDataset
    from gps_gaussian_tpu.train import losses
    from gps_gaussian_tpu.train import state as state_lib
    from gps_gaussian_tpu.train import trainer as T
    from gps_gaussian_tpu.train.config import load_config

    enc = (args.encoder_scale if args.encoder_scale is not None
           else args.backbone_scale)
    scales = {"img_encoder": enc,
              "raft_stereo": args.backbone_scale}
    if enc == 1.0 and args.backbone_scale == 1.0:
        scales = None           # single group, reference semantics
    overrides = {"dataset": {"data_root": args.data_root},
                 "lr": args.lr,
                 "lr_group_scales": scales}
    if args.flow_weight is not None:
        overrides["flow_weight"] = args.flow_weight
    cfg = load_config(args.config, stage="stage2", **overrides)
    ds_cfg = DatasetConfig(data_root=cfg.dataset.data_root, src_res=256,
                           source_ids=(0, 1), train_novel_ids=(2, 3, 4),
                           val_novel_ids=(3,), use_hr_img=True,
                           use_processed_data=True, znear=0.01, zfar=100.0)
    ds = StereoHumanDataset(ds_cfg, "train")
    vds = StereoHumanDataset(ds_cfg, "val")
    model = T.make_model(cfg, with_gs=True)
    rcfg = T.make_raster_config(cfg)
    loader = BatchLoader(ds, cfg.batch_size, (2, 3, 4), seed=0, num_procs=4)

    vbatch, _ = next(iter(eval_batches(vds, cfg.batch_size, (3,))))
    params = jax.jit(lambda k, b: model.init(k, b, iters=3))(
        jax.random.PRNGKey(1314), vbatch)
    params, n = state_lib.restore_params_partial(args.stage1_ckpt, params)
    print(f"warm start: {n} leaves; lr {args.lr} backbone x"
          f"{args.backbone_scale}", flush=True)
    state = state_lib.create_state(cfg, params)

    bg = jnp.zeros(3, jnp.float32)
    if args.bare_metrics:
        def _bare_loss(params, batch):
            out = model.apply(params, batch, iters=cfg.raft.train_iters)
            img_pred, _ = T.render_novel(out, batch.novel, bg, rcfg)
            l1 = losses.l1_loss(img_pred, batch.novel.img)
            ss = losses.ssim(img_pred, batch.novel.img)
            return (cfg.l1_weight * l1
                    + cfg.ssim_weight * (1.0 - ss)), {"l1": l1,
                                                      "train_epe": l1 * 0}

        def _bare_step(state, batch):
            (loss, metrics), grads = jax.value_and_grad(
                _bare_loss, has_aux=True)(state.params, batch)
            return state.apply_gradients(grads), dict(metrics, loss=loss)

        step_fn = _bare_step
    else:
        step_fn = T.make_train_step(model, cfg, "stage2", rcfg)
    train_step = (jax.jit(step_fn) if args.no_donate
                  else jax.jit(step_fn, donate_argnums=(0,)))

    @jax.jit
    def val_psnr(params, batch):
        out = model.apply(params, batch, iters=3, test_mode=True)
        img_pred, _ = T.render_novel(out, batch.novel, bg, rcfg)
        return (losses.psnr(img_pred, batch.novel.img).mean(),
                losses.l1_loss(img_pred, batch.novel.img))

    p, l = val_psnr(state.params, vbatch)
    print(f"step 0: val psnr {float(p):.2f} l1 {float(l):.4f}", flush=True)
    for i in range(args.steps):
        batch = next(loader)
        batch = jax.tree.map(jnp.asarray, batch)
        state, metrics = train_step(state, batch)
        if (i + 1) % args.eval_every == 0:
            p, l = val_psnr(state.params, vbatch)
            epe = metrics.get("train_epe")
            epe_s = f"epe {float(epe):.3f} " if epe is not None else ""
            print(f"step {i + 1}: train l1 {float(metrics['l1']):.4f} "
                  f"{epe_s}| val psnr {float(p):.2f} l1 {float(l):.4f}",
                  flush=True)
    loader.close()


if __name__ == "__main__":
    main()
