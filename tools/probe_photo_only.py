"""Diagnostic: photometric-only training probe from the stage1 warm start."""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp, optax
from gps_gaussian_tpu.data.thuman import DatasetConfig, StereoHumanDataset
from gps_gaussian_tpu.data.loader import BatchLoader, eval_batches
from gps_gaussian_tpu.train.config import load_config
from gps_gaussian_tpu.train import trainer as T, state as state_lib, losses


def main():
    cfg = load_config("configs/stage2_synth256.yaml", stage="stage2",
                      **{"dataset": {"data_root": "/root/repo/data/synth256"}})
    ds_cfg = DatasetConfig(data_root=cfg.dataset.data_root, src_res=256,
                           source_ids=(0, 1), train_novel_ids=(2, 3, 4),
                           val_novel_ids=(3,), use_hr_img=True,
                           use_processed_data=True, znear=0.01, zfar=100.0)
    ds = StereoHumanDataset(ds_cfg, "train")
    vds = StereoHumanDataset(ds_cfg, "val")
    model = T.make_model(cfg, with_gs=True)
    rcfg = T.make_raster_config(cfg)
    loader = BatchLoader(ds, 2, (2, 3, 4), seed=0, num_procs=4)

    import jax.random as jr
    vbatch, _ = next(iter(eval_batches(vds, 2, (3,))))
    params = model.init(jr.PRNGKey(1314), vbatch, iters=3)
    params, _ = state_lib.restore_params_partial("runs/synth256/stage1",
                                                 params)
    bg = jnp.zeros(3, jnp.float32)
    tx = optax.chain(optax.clip_by_global_norm(1.0),
                     optax.adamw(5e-5, weight_decay=1e-5, eps=1e-8))
    opt = tx.init(params)

    def photo_loss(params, batch):
        out = model.apply(params, batch, iters=3)
        img_pred, _ = T.render_novel(out, batch.novel, bg, rcfg)
        l1 = losses.l1_loss(img_pred, batch.novel.img)
        ss = losses.ssim(img_pred, batch.novel.img)
        return 0.8 * l1 + 0.2 * (1.0 - ss), (l1, ss)

    @jax.jit
    def step(params, opt, batch):
        (loss, (l1, ss)), g = jax.value_and_grad(
            photo_loss, has_aux=True)(params, batch)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss, l1

    @jax.jit
    def val_psnr(params, batch):
        out = model.apply(params, batch, iters=3, test_mode=True)
        img_pred, _ = T.render_novel(out, batch.novel, bg, rcfg)
        return (losses.psnr(img_pred, batch.novel.img).mean(),
                losses.l1_loss(img_pred, batch.novel.img))

    p, l = val_psnr(params, vbatch)
    print(f"step 0: val psnr {float(p):.2f} l1 {float(l):.4f}", flush=True)
    for i in range(200):
        batch = next(loader)
        params, opt, loss, l1 = step(params, opt, batch)
        if (i + 1) % 40 == 0:
            p, l = val_psnr(params, vbatch)
            print(f"step {i+1}: train l1 {float(l1):.4f} | "
                  f"val psnr {float(p):.2f} l1 {float(l):.4f}", flush=True)
    loader.close()


if __name__ == "__main__":
    main()
