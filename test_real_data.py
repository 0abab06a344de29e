#!/usr/bin/env python
"""Fixed-ratio sequence rendering CLI (capability of reference
test_real_data.py): render every frame of a capture sequence from one
interpolated viewpoint.

Usage:
    python test_real_data.py --config configs/stage2.yaml \
        --test_data_root /path/to/seq --ckpt_path experiments/s2/ckpt \
        --ratio 0.5 --src_view 0 1
"""

import argparse
import logging
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/stage2.yaml")
    ap.add_argument("--test_data_root", required=True)
    ap.add_argument("--ckpt_path", required=True)
    ap.add_argument("--ratio", type=float, default=0.5)
    ap.add_argument("--src_view", type=int, nargs=2, default=(0, 1))
    ap.add_argument("--shard_render", action="store_true",
                    help="shard the novel view's tile rows over all "
                         "devices (multi-chip 2K+ rendering)")
    ap.add_argument("--out_dir", default="test_out")
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
    for name, img in renderer.infer_sequence(args.ratio):
        imageio.imwrite(out / f"{name}_novel.jpg",
                        (img * 255).astype("uint8"))
        logging.info("rendered %s", name)


if __name__ == "__main__":
    main()
