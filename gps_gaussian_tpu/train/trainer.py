"""Two-stage trainers (capability of reference train_stage1.py /
train_stage2.py): stage1 pretrains disparity only; stage2 trains end-to-end
through the differentiable rasterizer with loss
1.0*flow + 0.8*L1 + 0.2*(1-SSIM) (train_stage2.py:70-72).

TPU-first structure: one jitted, donated train step; batches shard over the
('data',) mesh axis; parameters replicate; bf16 compute under
raft.mixed_precision with f32 losses and optimizer.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gps_gaussian_tpu.data.loader import BatchLoader, collate
from gps_gaussian_tpu.data.thuman import DatasetConfig, StereoHumanDataset
from gps_gaussian_tpu.kernels.rasterizer import RasterizeConfig, rasterize
from gps_gaussian_tpu.models.gps_gaussian import GPSGaussianModel
from gps_gaussian_tpu.train import losses, sharding, state as state_lib
from gps_gaussian_tpu.train.config import Config
from gps_gaussian_tpu.utils.profiling import StepTimer
from gps_gaussian_tpu.utils.containers import NovelView, StereoSample

log = logging.getLogger("gps_tpu.train")


def make_model(cfg: Config, with_gs: bool) -> GPSGaussianModel:
    return GPSGaussianModel(
        encoder_dims=tuple(cfg.raft.encoder_dims),
        hidden_dim=cfg.raft.hidden_dims[2],
        context_dim=cfg.raft.hidden_dims[2],
        corr_levels=cfg.raft.corr_levels,
        corr_radius=cfg.raft.corr_radius,
        gsnet_encoder_dims=tuple(cfg.gsnet.encoder_dims),
        gsnet_decoder_dims=tuple(cfg.gsnet.decoder_dims),
        gsnet_head_dim=cfg.gsnet.parm_head_dim,
        with_gs=with_gs,
        dtype=jnp.bfloat16 if cfg.raft.mixed_precision else None)


def make_raster_config(cfg: Config) -> RasterizeConfig:
    return RasterizeConfig(
        max_tiles_per_gaussian=cfg.raster.max_tiles_per_gaussian,
        max_per_tile=cfg.raster.max_per_tile,
        fg_cap=cfg.raster.fg_cap,
        pair_budget=cfg.raster.pair_budget,
        backend=cfg.raster.backend)


def render_novel(out, novel: NovelView, bg_color, rcfg: RasterizeConfig):
    """Splat both views' pixel-aligned Gaussians into the novel camera
    (capability of lib/GaussianRender.py pts2render, batched not looped).

    Returns (images, RasterizeAux) so callers can log the drop counters —
    static caps are counted, never silent."""
    gauss = out.lmain_gs.flatten().concat(out.rmain_gs.flatten())
    return rasterize(gauss, novel.camera, jnp.asarray(bg_color), rcfg)


def drop_metrics(aux, prefix: str = "") -> dict:
    """Batch-summed capacity-cap drop counters as float metrics."""
    return {
        f"{prefix}num_dropped": jnp.sum(aux.num_dropped).astype(jnp.float32),
        f"{prefix}num_fg_dropped":
            jnp.sum(aux.num_fg_dropped).astype(jnp.float32),
        f"{prefix}num_pair_dropped":
            jnp.sum(aux.num_pair_dropped).astype(jnp.float32),
    }


def _stacked_flow_gt(batch: StereoSample):
    flow = jnp.concatenate([batch.lmain.flow, batch.rmain.flow], axis=0)
    valid = jnp.concatenate([batch.lmain.valid, batch.rmain.valid], axis=0)
    return flow, valid


def make_train_step(model: GPSGaussianModel, cfg: Config, stage: str,
                    rcfg: RasterizeConfig, axis_name: Optional[str] = None):
    """One SGD step.  With axis_name set, the step body is written for
    shard_map over that mesh axis: per-chip gradients/metrics are
    pmean-reduced, so the step runs identical param updates on every chip
    (see make_sharded_train_step)."""
    bg = jnp.asarray(cfg.dataset.bg_color, jnp.float32)

    def apply_model(params, batch):
        return model.apply(params, batch, iters=cfg.raft.train_iters)

    if cfg.remat:
        apply_model = jax.checkpoint(apply_model)

    def loss_fn(params, batch: StereoSample):
        out = apply_model(params, batch)
        if stage == "stage1":
            flow_gt, valid = _stacked_flow_gt(batch)
            flow_loss, metrics = losses.sequence_loss(
                out.flow_preds, flow_gt, valid)
            return flow_loss, metrics
        img_pred, raux = render_novel(out, batch.novel, bg, rcfg)
        img_gt = batch.novel.img
        l1 = losses.l1_loss(img_pred, img_gt)
        ssim_val = losses.ssim(img_pred, img_gt)
        total = cfg.l1_weight * l1 + cfg.ssim_weight * (1.0 - ssim_val)
        metrics = dict(l1=l1, ssim=ssim_val, **drop_metrics(raux))
        if cfg.flow_weight != 0.0:
            flow_gt, valid = _stacked_flow_gt(batch)
            flow_loss, fmetrics = losses.sequence_loss(
                out.flow_preds, flow_gt, valid)
            total = total + cfg.flow_weight * flow_loss
            metrics = dict(metrics, flow_loss=flow_loss, **fmetrics)
        # flow_weight 0: the flow branch must leave the gradient program
        # ENTIRELY, not ride along for metrics.  Even a dead 0*flow term
        # — or just sequence_loss's metric reductions — keeps the three
        # full-res convex-upsample flow branches live in the compiled
        # step, and the altered bf16 fusion/rematerialization perturbs
        # the SHARED backbone gradients enough to flip the training
        # trajectory into a collapsing basin: measured on-chip, the
        # metrics-in-program step falls 33 -> 29 dB val PSNR in 50
        # steps while the bitwise-same-loss bare program climbs to 35.6
        # (ROADMAP.md stage-2 findings).  EPE still surfaces via the
        # eval sweep's val_epe.
        return total, metrics

    def train_step(state: state_lib.TrainState, batch: StereoSample):
        (loss, metrics), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params, batch)
        metrics = dict(metrics, loss=loss)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
            # drop counters are batch SUMS; everything else batch means
            metrics = {k: (jax.lax.psum(v, axis_name) if "drop" in k
                           else jax.lax.pmean(v, axis_name))
                       for k, v in metrics.items()}
        new_state = state.apply_gradients(grads)
        return new_state, metrics

    return train_step


def make_sharded_train_step(model: GPSGaussianModel, cfg: Config,
                            stage: str, rcfg: RasterizeConfig, mesh,
                            axis_name: str = "data"):
    """The multi-chip train step: shard_map over the ('data',) mesh.

    jit's automatic SPMD partitioner cannot split a pallas_call, so on a
    real multi-chip mesh the Pallas rasterizer must run per-chip under
    shard_map: the batch shards over `axis_name`, parameters/optimizer
    state replicate, gradients pmean over ICI inside the step (the
    all-reduce the reference never had — SURVEY.md §2.4 DP row).
    Numerically identical to the single-chip step for equal shard sizes.
    """
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    step = make_train_step(model, cfg, stage, rcfg, axis_name=axis_name)
    return shard_map(step, mesh=mesh,
                     in_specs=(P(), P(axis_name)),
                     out_specs=(P(), P()), check_vma=False)


def make_sharded_eval_step(model: GPSGaussianModel, cfg: Config,
                           stage: str, rcfg: RasterizeConfig, mesh,
                           axis_name: str = "data"):
    """Eval step under shard_map (same reason as make_sharded_train_step:
    pallas_call does not auto-partition).  Metrics pmean (drop counters
    psum); preview images come back batch-sharded."""
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    base = make_eval_step(model, cfg, stage, rcfg)

    def step(params, batch, weight):
        metrics, img_pred = base(params, batch, weight)
        # metrics are (numerator, denominator) pairs; psum both so every
        # chip/host sees the exact global weighted ratio
        metrics = {k: (jax.lax.psum(num, axis_name),
                       jax.lax.psum(den, axis_name))
                   for k, (num, den) in metrics.items()}
        return metrics, img_pred

    return shard_map(step, mesh=mesh,
                     in_specs=(P(), P(axis_name), P(axis_name)),
                     out_specs=(P(), P(axis_name)), check_vma=False)


def make_eval_step(model: GPSGaussianModel, cfg: Config, stage: str,
                   rcfg: RasterizeConfig):
    bg = jnp.asarray(cfg.dataset.bg_color, jnp.float32)

    def _stage1_preview(batch: StereoSample, flow_up):
        """Point-splat the predicted geometry into the novel camera —
        the reference's Taichi preview (train_stage1.py:99-100,
        lib/TaichiRender.py), as a jnp scatter-max."""
        from gps_gaussian_tpu.geometry.pointcloud import (
            flow_to_inv_depth, inv_depth_to_points)
        from gps_gaussian_tpu.kernels.point_splat import splat_points

        bs = batch.lmain.img.shape[0]
        pts, rgbs, valids = [], [], []
        for i, view in enumerate((batch.lmain, batch.rmain)):
            flow_v = flow_up[i * bs:(i + 1) * bs]
            inv_d = flow_to_inv_depth(flow_v, view.intr, view.ref_intr,
                                      view.tf_x, view.mask)
            xyz = inv_depth_to_points(inv_d[..., 0], view.extr, view.intr)
            pts.append(xyz.reshape(bs, -1, 3))
            rgbs.append((view.img * 0.5 + 0.5).reshape(bs, -1, 3))
            valids.append((inv_d[..., 0] != 0).astype(jnp.float32)
                          .reshape(bs, -1))
        h = batch.novel.camera.height
        w = batch.novel.camera.width
        return splat_points(
            jnp.concatenate(pts, 1), jnp.concatenate(rgbs, 1),
            jnp.concatenate(valids, 1), batch.novel.intr,
            batch.novel.extr, h, w)

    def eval_step(params, batch: StereoSample, weight):
        """weight (B,) f32 masks wrapped-tail duplicate samples out of the
        val means (data/loader.py eval_batches).  Every metric returns as
        a (numerator, denominator) pair so cross-batch / cross-chip
        aggregation stays exact under arbitrary weights."""
        out = model.apply(params, batch, iters=cfg.raft.val_iters,
                          test_mode=True)
        flow_gt, valid = _stacked_flow_gt(batch)
        epe = jnp.sqrt(jnp.sum((out.final_flow - flow_gt) ** 2, axis=-1))
        w2 = jnp.concatenate([weight, weight])[:, None, None]
        vm = (valid >= 0.5).astype(jnp.float32)[..., 0] * w2
        metrics = {
            "val_epe": ((epe * vm).sum(), vm.sum()),
            "val_1px": (((epe < 1).astype(jnp.float32) * vm).sum(),
                        vm.sum()),
        }
        if stage == "stage2":
            img_pred, raux = render_novel(out, batch.novel, bg, rcfg)
            metrics["val_psnr"] = (
                (losses.psnr(img_pred, batch.novel.img) * weight).sum(),
                weight.sum())
            one = jnp.ones((), jnp.float32)
            metrics.update({k: (v, one) for k, v in
                            drop_metrics(raux, prefix="val_").items()})
        else:
            img_pred = (_stage1_preview(batch, out.final_flow)
                        if batch.novel is not None else None)
        return metrics, img_pred

    return eval_step


class Trainer:
    """Experiment driver: loaders, jitted steps, logging, checkpoints."""

    def __init__(self, cfg: Config, exp_dir: Optional[str] = None,
                 dataset: Optional[StereoHumanDataset] = None,
                 val_dataset: Optional[StereoHumanDataset] = None,
                 mesh=None):
        self.cfg = cfg
        self.stage = cfg.stage
        self.exp_dir = Path(exp_dir or
                            f"{cfg.record.ckpt_path}/{cfg.name}")
        for sub in ("ckpt", "show", "logs"):
            (self.exp_dir / sub).mkdir(parents=True, exist_ok=True)

        ds_cfg = DatasetConfig(
            data_root=cfg.dataset.data_root,
            src_res=cfg.dataset.src_res,
            source_ids=tuple(cfg.dataset.source_id),
            train_novel_ids=tuple(cfg.dataset.train_novel_id),
            val_novel_ids=tuple(cfg.dataset.val_novel_id),
            use_hr_img=cfg.dataset.use_hr_img,
            use_processed_data=cfg.dataset.use_processed_data,
            znear=cfg.dataset.znear, zfar=cfg.dataset.zfar)
        self.train_ds = dataset or StereoHumanDataset(ds_cfg, "train")
        self.val_ds = val_dataset or StereoHumanDataset(ds_cfg, "val")

        novel_train = tuple(cfg.dataset.train_novel_id)
        self.train_loader = BatchLoader(
            self.train_ds, cfg.batch_size, novel_train,
            seed=cfg.seed if cfg.loader_seed is None else cfg.loader_seed,
            num_procs=cfg.dataset.num_workers,
            process_index=jax.process_index(),
            process_count=jax.process_count())

        self.model = make_model(cfg, with_gs=(self.stage == "stage2"))
        self.rcfg = make_raster_config(cfg)
        self.mesh = mesh or sharding.make_mesh()
        n_dev = self.mesh.devices.size
        if cfg.batch_size % n_dev != 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} must be divisible by the "
                f"{n_dev}-device ('data',) mesh — the train step "
                f"shard_maps the batch axis over it (e.g. stage1's bs=6 "
                f"needs a 1/2/3/6-chip mesh, or raise batch_size)")

        # init params from one host batch.  model.init must be jitted: un-
        # jitted flax init dispatches each traced op eagerly, and through a
        # remote-TPU tunnel (~24 ms RPC per dispatch) a stage-2 init takes
        # MINUTES; jitted it is one compile + one dispatch.  The batch is
        # built straight from the dataset, NOT pulled from train_loader:
        # consuming a loader batch for init would shift the training data
        # order by one batch relative to an identically-seeded probe run
        # (early stage-2 trajectories are sample-order sensitive —
        # ROADMAP.md stage-2 findings)
        init_batch = self._device_batch(collate(
            [self.train_ds.get_sample(i % len(self.train_ds), novel_train)
             for i in range(cfg.batch_size)]))
        params = jax.jit(
            lambda k, b: self.model.init(k, b, iters=cfg.raft.train_iters)
        )(jax.random.PRNGKey(cfg.seed), init_batch)
        if self.stage == "stage2" and cfg.stage1_ckpt:
            params, n = state_lib.restore_params_partial(
                cfg.stage1_ckpt, params)
            log.info("stage1 warm start: %d leaves restored", n)
        self.state = state_lib.create_state(cfg, params)
        self.state = self.state.replace(
            params=sharding.replicate(self.mesh, self.state.params),
            opt_state=sharding.replicate(self.mesh, self.state.opt_state))
        if cfg.restore_ckpt:
            self.state = state_lib.restore_checkpoint(cfg.restore_ckpt,
                                                      self.state)
            log.info("resumed at step %d", int(self.state.step))

        if self.mesh.devices.size > 1:
            # shard_map over ('data',): jit's automatic partitioner cannot
            # split a pallas_call, so multi-chip training runs the step
            # per-chip with an in-step gradient pmean
            self.train_step = jax.jit(
                make_sharded_train_step(self.model, cfg, self.stage,
                                        self.rcfg, self.mesh),
                donate_argnums=(0,))
            self.eval_step = jax.jit(
                make_sharded_eval_step(self.model, cfg, self.stage,
                                       self.rcfg, self.mesh))
        else:
            self.train_step = jax.jit(
                make_train_step(self.model, cfg, self.stage, self.rcfg),
                donate_argnums=(0,))
            self.eval_step = jax.jit(
                make_eval_step(self.model, cfg, self.stage, self.rcfg))

        self.writer = None
        try:
            from tensorboardX import SummaryWriter

            self.writer = SummaryWriter(str(self.exp_dir / "logs"))
        except Exception:
            pass
        self._snapshot_provenance()

    def _snapshot_provenance(self):
        """Record code provenance with the experiment (the reference's
        file_backup, train_recoder.py:10-24, via git instead of copies)."""
        import subprocess

        prov = self.exp_dir / "provenance.txt"
        try:
            root = Path(__file__).resolve().parent.parent.parent
            rev = subprocess.run(["git", "-C", str(root), "rev-parse",
                                  "HEAD"], capture_output=True, text=True)
            dirty = subprocess.run(["git", "-C", str(root), "status",
                                    "--porcelain"], capture_output=True,
                                   text=True)
            with open(prov, "w") as f:
                f.write(f"git: {rev.stdout.strip()}\n")
                f.write(f"dirty files:\n{dirty.stdout}")
        except Exception:
            pass

    # ------------------------------------------------------------------
    def _device_batch(self, batch: StereoSample) -> StereoSample:
        return sharding.shard_batch(self.mesh, batch)

    def train(self, num_steps: Optional[int] = None,
              trace_steps: Optional[tuple] = None,
              trace_dir: Optional[str] = None,
              eval_first: bool = False):
        """trace_steps=(lo, hi) captures a jax.profiler trace of that step
        window into trace_dir (default <exp>/logs/profile).  eval_first
        runs one val sweep before any update — the step-0 anchor that the
        reference never logs (train_stage2.py evals only every eval_freq),
        needed to show metrics climbing *from* the untrained state."""
        cfg = self.cfg
        total = num_steps or cfg.num_steps
        running: dict = {}
        timer = StepTimer(cfg.batch_size)
        t0 = time.time()
        start_step = int(self.state.step)
        if eval_first and start_step == 0:
            self.run_eval(0)
        tracing = False
        for step in range(start_step, total):
            if trace_steps and step == trace_steps[0] and not tracing:
                import jax as _jax

                _jax.profiler.start_trace(
                    trace_dir or str(self.exp_dir / "logs" / "profile"))
                tracing = True
            batch = self._device_batch(next(self.train_loader))
            timer.start()
            self.state, metrics = self.train_step(self.state, batch)
            jax.block_until_ready(metrics)
            timer.stop()
            if tracing and step + 1 >= trace_steps[1]:
                import jax as _jax

                _jax.profiler.stop_trace()
                tracing = False

            for k, v in metrics.items():
                running[k] = running.get(k, 0.0) + float(v)
            if (step + 1) % cfg.record.loss_freq == 0:
                n = cfg.record.loss_freq
                msg = " ".join(f"{k}={v / n:.4f}"
                               for k, v in sorted(running.items()))
                log.info("step %d: %s (%.2f pairs/s, %.1f ms/step)",
                         step + 1, msg, timer.pairs_per_s, timer.step_ms)
                if self.writer:
                    for k, v in running.items():
                        self.writer.add_scalar(k, v / n, step + 1)
                    self.writer.add_scalar("perf/pairs_per_s",
                                           timer.pairs_per_s, step + 1)
                    self.writer.add_scalar("perf/step_ms", timer.step_ms,
                                           step + 1)
                running, t0 = {}, time.time()
                state_lib.save_checkpoint(str(self.exp_dir / "ckpt"),
                                          self.state)
            if (step + 1) % cfg.record.eval_freq == 0:
                self.run_eval(step + 1)
        state_lib.save_checkpoint(str(self.exp_dir / "ckpt"), self.state,
                                  wait=True)
        return self.state

    def run_eval(self, step: int, max_batches: Optional[int] = None):
        """Deterministic full sweep of the val set (reference
        train_stage2.py:103-139 full val loop) — not random batches, so
        val metrics are comparable run-to-run."""
        from gps_gaussian_tpu.data.loader import eval_batches

        num_agg: dict = {}
        den_agg: dict = {}
        preview = None
        n = 0
        for batch, weight in eval_batches(
                self.val_ds, self.cfg.batch_size,
                tuple(self.cfg.dataset.val_novel_id),
                process_index=jax.process_index(),
                process_count=jax.process_count(),
                max_batches=max_batches
                or self.cfg.dataset.eval_max_batches):
            batch = self._device_batch(batch)
            metrics, img_pred = self.eval_step(self.state.params, batch,
                                               jnp.asarray(weight))
            for k, (num, den) in metrics.items():
                num_agg[k] = num_agg.get(k, 0.0) + float(num)
                den_agg[k] = den_agg.get(k, 0.0) + float(den)
            if n == 0 and img_pred is not None:
                preview = np.asarray(img_pred[0])
            n += 1
        final = {k: num_agg[k] / max(den_agg[k], 1e-12) for k in num_agg}
        msg = " ".join(f"{k}={v:.4f}" for k, v in sorted(final.items()))
        log.info("eval @%d: %s", step, msg)
        if self.writer:
            for k, v in final.items():
                self.writer.add_scalar(k, v, step)
        if preview is not None:
            try:
                import imageio.v2 as imageio

                imageio.imwrite(
                    str(self.exp_dir / "show" / f"{step:08d}.jpg"),
                    (np.clip(preview, 0, 1) * 255).astype(np.uint8))
            except Exception as e:
                log.warning("eval preview write failed: %s", e)
        return final

    def close(self):
        self.train_loader.close()
        if self.writer:
            self.writer.close()
