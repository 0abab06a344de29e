"""Freeview novel-view inference (capability of reference
test_view_interp.py / test_real_data.py).

Improvement over the reference: the full stereo network re-runs for every
interpolation ratio there (test_view_interp.py:42-44); here the expensive
stereo forward runs ONCE per frame and only the (cheap) rasterization
re-runs per novel viewpoint — the split that makes real-time freeview
sweeps possible.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gps_gaussian_tpu.data.loader import collate
from gps_gaussian_tpu.data.thuman import StereoHumanDataset
from gps_gaussian_tpu.geometry import cameras
from gps_gaussian_tpu.kernels.rasterizer import rasterize
from gps_gaussian_tpu.train.config import Config
from gps_gaussian_tpu.train.trainer import make_model, make_raster_config
from gps_gaussian_tpu.utils.containers import (FlatGaussians, NovelCamera,
                                               StereoSample)


def compact_valid(gauss: FlatGaussians, cap: int):
    """Pack valid Gaussians into the first `cap` slots (batch 1).

    Foreground masks are camera-independent, so freeview sweeps compact
    ONCE per frame here instead of once per rendered view inside the
    rasterizer (the per-view argsort+gather was ~13 ms at 1024^2).
    The move happens at 8-row/128-lane SUPER-ROW granularity exactly like
    compact_gaussian_inputs: row gathers are DMA-transaction-bound on TPU
    and 512 B rows run ~7x faster than 64 B rows for the same volume.
    `cap` must be a multiple of 8 and carry ~1.3x-foreground slack;
    dropped valid rows are counted.  Returns (FlatGaussians, num_dropped).
    """
    from gps_gaussian_tpu.kernels.rasterizer.compaction import \
        live_first_order
    from gps_gaussian_tpu.kernels.rasterizer.pallas_kernel import \
        take_rows_unique

    n = gauss.valid.shape[1]
    valid_f = (gauss.valid[0] > 0.0).astype(jnp.float32)
    if cap >= n:
        def take(x):
            return jnp.pad(x, ((0, 0), (0, cap - n))
                           + ((0, 0),) * (x.ndim - 2))

        live = valid_f if cap == n else jnp.pad(valid_f, (0, cap - n))
        return FlatGaussians(
            xyz=take(gauss.xyz), rgb=take(gauss.rgb),
            rot=take(gauss.rot), scale=take(gauss.scale),
            opacity=take(gauss.opacity),
            valid=live[None]), jnp.zeros((), jnp.int32)
    if cap % 8 or n % 8:
        raise ValueError(f"compact_valid: cap={cap} and N={n} must be "
                         f"multiples of 8 (super-row compaction)")

    opacity = gauss.opacity.reshape(1, n, 1)
    rows = jnp.concatenate(
        [gauss.xyz[0], gauss.rot[0], gauss.scale[0], opacity[0],
         gauss.rgb[0], valid_f.reshape(n, 1),
         jnp.zeros((n, 1), gauss.xyz.dtype)], axis=1)    # (N, 16)
    rows128 = rows.astype(jnp.float32).reshape(n // 8, 128)
    live_super = valid_f.reshape(n // 8, 8).max(axis=1)
    idx, slot_live, _ = live_first_order(live_super > 0.5, cap // 8)
    rank = jnp.cumsum(live_super) - live_super
    kept_super = live_super * (rank < cap // 8)
    rows_per_super = valid_f.reshape(n // 8, 8).sum(axis=1)
    n_dropped = (jnp.sum(valid_f)
                 - jnp.sum(rows_per_super * kept_super)).astype(jnp.int32)
    out128 = take_rows_unique(rows128, idx.astype(jnp.float32))
    out128 = out128 * slot_live[:, None]
    rows = out128.reshape(cap, 16)
    out = FlatGaussians(
        xyz=rows[None, :, 0:3], rot=rows[None, :, 3:7],
        scale=rows[None, :, 7:10], opacity=rows[None, :, 10:11],
        rgb=rows[None, :, 11:14],
        valid=rows[None, :, 14])
    return out, n_dropped


class FreeviewRenderer:
    """Stereo forward once -> pixel-aligned Gaussians -> render any view.

    Pass a multi-device `mesh` to shard the novel view's tile rows over
    chips (kernels/rasterizer/sharded.py) — the multi-chip path for 2K+
    targets (SURVEY.md §2.4 sequence-parallel analogue)."""

    def __init__(self, cfg: Config, params, dataset: Optional[
            StereoHumanDataset] = None, mesh=None):
        self.cfg = cfg
        self.params = params
        self.model = make_model(cfg, with_gs=True)
        rcfg = make_raster_config(cfg)
        # compaction moves to the once-per-frame forward (compact_valid);
        # per-view rendering then skips its own fg compaction entirely
        self._fg_cap = rcfg.fg_cap
        self.rcfg = (dataclasses.replace(rcfg, fg_cap=None)
                     if rcfg.fg_cap is not None else rcfg)
        self.bg = jnp.asarray(cfg.dataset.bg_color, jnp.float32)
        self.dataset = dataset
        self.mesh = mesh if (mesh is not None
                             and mesh.devices.size > 1) else None

        self._forward = jax.jit(self._forward_impl)
        self._render = {}
        # reading the drop counters forces a device->host sync that
        # serializes dispatch; check the first frame and then every Nth
        # (0 = never) instead of stalling the sweep on every view.
        # Between checks, counters ACCUMULATE on-device (a cheap add on
        # the dispatch stream, no sync) so overflow on unchecked frames
        # is never lost — flush_drop_report() reads the totals with one
        # sync at end-of-sweep.
        self.check_drops_every = 16
        self._frames_rendered = 0
        self._frames_forwarded = 0   # gaussians() has its own cadence
        # device-scalar handles, NOT synced values: kept as-is per frame
        # (no extra dispatches mid-sweep) and reduced with one sync in
        # flush_drop_report
        self._fg_drop_handles = []
        self._pair_drop_handles = []

    # -------------------------------------------------------------- core
    def _forward_impl(self, batch: StereoSample):
        out = self.model.apply(self.params, batch,
                               iters=self.cfg.raft.val_iters,
                               test_mode=True)
        gauss = out.lmain_gs.flatten().concat(out.rmain_gs.flatten())
        if self._fg_cap is None:
            return gauss, jnp.zeros((), jnp.int32)
        return compact_valid(gauss, self._fg_cap)

    def gaussians(self, batch: StereoSample) -> FlatGaussians:
        gauss, n_dropped = self._forward(batch)
        # reading the counter is a host sync that breaks dispatch
        # pipelining — throttle on a counter gaussians() itself advances
        # (render()'s cadence doesn't apply to forward-only callers) and
        # keep the device handle so no unchecked frame goes unreported
        self._fg_drop_handles.append(n_dropped)
        every = self.check_drops_every
        if every and self._frames_forwarded % every == 0:
            drops = int(n_dropped)
            if drops:
                import logging

                logging.getLogger("gps_tpu.infer").warning(
                    "foreground compaction dropped %d valid gaussians this "
                    "frame (raise raster.fg_cap)", drops)
        self._frames_forwarded += 1
        return gauss

    def flush_drop_report(self):
        """One host sync: total drops accumulated across the sweep.

        Returns (fg_drops, pair_drops) and logs if nonzero; sweeps call
        this once at the end so sustained overflow on throttled
        (unchecked) frames can never pass silently."""
        fg = (int(jnp.sum(jnp.stack(self._fg_drop_handles)))
              if self._fg_drop_handles else 0)
        pair = (int(jnp.sum(jnp.stack(
            [h.num_dropped.sum() + h.num_fg_dropped.sum()
             + h.num_pair_dropped.sum() for h in self._pair_drop_handles])))
            if self._pair_drop_handles else 0)
        self._fg_drop_handles.clear()
        self._pair_drop_handles.clear()
        if fg or pair:
            import logging

            logging.getLogger("gps_tpu.infer").warning(
                "sweep total: %d valid gaussians dropped by fg_cap, %d "
                "pairs dropped by capacity caps (raise raster.fg_cap/"
                "max_per_tile/pair_budget)", fg, pair)
        return fg, pair

    def render(self, gauss: FlatGaussians, camera: NovelCamera):
        """Returns (images (1,H,W,3), RasterizeAux with drop counters)."""
        key = (camera.height, camera.width)
        if key not in self._render:
            if self.mesh is not None:
                from gps_gaussian_tpu.kernels.rasterizer.sharded import \
                    rasterize_tile_sharded

                self._render[key] = jax.jit(
                    lambda g, c: rasterize_tile_sharded(
                        g, c, self.bg, self.rcfg, self.mesh))
            else:
                self._render[key] = jax.jit(
                    lambda g, c: rasterize(g, c, self.bg, self.rcfg))
        img, aux = self._render[key](gauss, camera)
        self._pair_drop_handles.append(aux)
        every = self.check_drops_every
        if every and self._frames_rendered % every == 0:
            drops = int(aux.num_dropped.sum() + aux.num_fg_dropped.sum()
                        + aux.num_pair_dropped.sum())
            if drops:
                import logging

                logging.getLogger("gps_tpu.infer").warning(
                    "rasterizer capacity caps dropped %d pairs this frame "
                    "(raise fg_cap/max_per_tile/pair_budget)", drops)
        self._frames_rendered += 1
        return img, aux

    # ------------------------------------------------------------ drivers
    def novel_camera_at(self, sample: dict, ratio: float,
                        height: int, width: int) -> NovelCamera:
        """Interpolated camera between the ORIGINAL (unrectified) source
        poses (reference lib/utils.py:9-55 get_novel_calib)."""
        intr0, intr1 = sample["intr_ori"]
        extr0, extr1 = sample["extr_ori"]
        hr_scale = 2.0 if self.cfg.dataset.use_hr_img else 1.0
        cam, _, _ = cameras.interpolated_novel_camera(
            intr0, extr0, intr1, extr1, ratio, height, width,
            hr_scale=hr_scale, znear=self.cfg.dataset.znear,
            zfar=self.cfg.dataset.zfar)
        return cameras.make_novel_camera([cam], height, width)

    def infer_static(self, index: int, n_views: int = 9):
        """Sweep ratios (i+0.5)/N for one frame (test_view_interp.py:34-47).

        The stereo forward runs once; each view re-renders only."""
        assert self.dataset is not None
        sample = self.dataset.get_test_sample(index)
        batch = collate([sample])
        gauss = self.gaussians(batch)
        res = self.cfg.dataset.src_res
        out_res = res * 2 if self.cfg.dataset.use_hr_img else res
        # pipelined sweep with a BOUNDED window: render() is an async jit
        # dispatch, so keeping a few views in flight overlaps device work
        # with host transfers — but holding ALL n_views resident would
        # cost n_views * H*W*3 f32 of HBM next to the rasterizer
        # workspace (~50 MB/frame at 2K), so the oldest handle is
        # materialized as each new view is dispatched
        window = 4
        handles, out = [], []
        for i in range(n_views):
            ratio = (i + 0.5) / n_views
            cam = self.novel_camera_at(sample, ratio, out_res, out_res)
            img, _ = self.render(gauss, cam)
            handles.append(img)
            if len(handles) > window:
                out.append(np.clip(np.asarray(handles.pop(0)[0]), 0, 1))
        out.extend(np.clip(np.asarray(h[0]), 0, 1) for h in handles)
        self.flush_drop_report()
        return out

    def infer_sequence(self, ratio: float = 0.5):
        """Render every dataset frame at one fixed novel ratio
        (test_real_data.py:34-45)."""
        assert self.dataset is not None
        res = self.cfg.dataset.src_res
        out_res = res * 2 if self.cfg.dataset.use_hr_img else res
        # 1-deep software pipeline: frame i+1's forward+render dispatch
        # overlaps frame i's device->host transfer and the caller's
        # decode/save work
        prev = None
        for idx in range(len(self.dataset)):
            sample = self.dataset.get_test_sample(idx)
            batch = collate([sample])
            gauss = self.gaussians(batch)
            cam = self.novel_camera_at(sample, ratio, out_res, out_res)
            img, _ = self.render(gauss, cam)
            if prev is not None:
                yield prev[0], np.clip(np.asarray(prev[1][0]), 0, 1)
            prev = (sample["name"], img)
        if prev is not None:
            yield prev[0], np.clip(np.asarray(prev[1][0]), 0, 1)
        self.flush_drop_report()


def load_renderer(cfg: Config, ckpt_dir: str,
                  dataset: Optional[StereoHumanDataset] = None,
                  example_batch: Optional[StereoSample] = None,
                  mesh=None) -> FreeviewRenderer:
    """Restore trained params and build a renderer.  A multi-device
    `mesh` shards the novel view's tile rows over chips."""
    from gps_gaussian_tpu.train import state as state_lib

    model = make_model(cfg, with_gs=True)
    if example_batch is None:
        assert dataset is not None
        example_batch = collate([dataset.get_test_sample(0)])
    params = model.init(jax.random.PRNGKey(0), example_batch,
                        iters=cfg.raft.val_iters, test_mode=True)
    params, n = state_lib.restore_params_partial(ckpt_dir, params)
    if n == 0:
        raise FileNotFoundError(f"no restorable params in {ckpt_dir}")
    return FreeviewRenderer(cfg, params, dataset, mesh=mesh)
