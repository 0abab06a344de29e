#!/usr/bin/env python
"""Freeview interpolation CLI (capability of reference test_view_interp.py):
render N interpolated novel viewpoints per frame between the two source
cameras.

Usage:
    python test_view_interp.py --config configs/stage2.yaml \
        --test_data_root /path/to/data --ckpt_path experiments/s2/ckpt \
        --novel_view_nums 5 --src_view 0 1
"""

import argparse
import logging
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/stage2.yaml")
    ap.add_argument("--test_data_root", required=True)
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--novel_view_nums", type=int, default=5)
    ap.add_argument("--src_view", type=int, nargs=2, default=(0, 1))
    ap.add_argument("--shard_render", action="store_true",
                    help="shard the novel view's tile rows over all "
                         "devices (multi-chip 2K+ rendering)")
    ap.add_argument("--out_dir", default="interp_out")
    args = ap.parse_args()

    logging.basicConfig(level=logging.INFO)

    import imageio.v2 as imageio

    from gps_gaussian_tpu.data.thuman import (DatasetConfig,
                                              StereoHumanDataset)
    from gps_gaussian_tpu.infer.freeview import load_renderer
    from gps_gaussian_tpu.train.config import load_config

    cfg = load_config(args.config)
    ds_cfg = DatasetConfig(
        data_root=args.test_data_root, src_res=cfg.dataset.src_res,
        source_ids=tuple(args.src_view), use_hr_img=cfg.dataset.use_hr_img,
        use_processed_data=False)
    dataset = StereoHumanDataset(ds_cfg, "test")
    mesh = None
    if args.shard_render:
        from gps_gaussian_tpu.train.sharding import make_mesh

        mesh = make_mesh()
    renderer = load_renderer(cfg, args.ckpt_path, dataset, mesh=mesh)

    out = Path(args.out_dir)
    out.mkdir(parents=True, exist_ok=True)
    for idx in range(len(dataset)):
        images = renderer.infer_static(idx, n_views=args.novel_view_nums)
        name = dataset.scans[idx]
        for i, img in enumerate(images):
            imageio.imwrite(out / f"{name}_novel{i}.jpg",
                            (img * 255).astype("uint8"))
        logging.info("rendered %s (%d views)", name, len(images))


if __name__ == "__main__":
    main()
