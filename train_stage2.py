#!/usr/bin/env python
"""Stage-2 end-to-end training CLI (capability of reference train_stage2.py).

Usage:
    python train_stage2.py --config configs/stage2.yaml \
        --data_root /path/to/data --stage1_ckpt experiments/s1/ckpt
"""

import argparse
import logging


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/stage2.yaml")
    ap.add_argument("--data_root", default=None)
    ap.add_argument("--exp_dir", default=None)
    ap.add_argument("--stage1_ckpt", default=None)
    ap.add_argument("--restore_ckpt", default=None)
    ap.add_argument("--num_steps", type=int, default=None)
    ap.add_argument("--eval_freq", type=int, default=None)
    ap.add_argument("--eval_first", action="store_true",
                    help="run one val sweep at step 0 (untrained anchor)")
    args = ap.parse_args()

    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(name)s %(message)s")

    from gps_gaussian_tpu.train import sharding
    from gps_gaussian_tpu.train.config import load_config, save_config
    from gps_gaussian_tpu.train.trainer import Trainer

    sharding.init_distributed()

    overrides = {}
    if args.data_root:
        overrides["dataset"] = {"data_root": args.data_root}
    if args.stage1_ckpt:
        overrides["stage1_ckpt"] = args.stage1_ckpt
    if args.restore_ckpt:
        overrides["restore_ckpt"] = args.restore_ckpt
    if args.num_steps:
        overrides["num_steps"] = args.num_steps
    if args.eval_freq:
        overrides["record"] = {"eval_freq": args.eval_freq}
    cfg = load_config(args.config, stage="stage2", **overrides)

    trainer = Trainer(cfg, exp_dir=args.exp_dir)
    save_config(cfg, str(trainer.exp_dir / "cfg.json"))
    try:
        trainer.train(eval_first=args.eval_first)
    finally:
        trainer.close()


if __name__ == "__main__":
    main()
