"""Loader input-boundness probe (reference DataLoader workers,
train_stage1.py:32-36): is the training step ever waiting on input?

Runs the real Trainer loop at the given config and measures, per step,
(a) the wall time spent in `next(train_loader)` (input wait) and (b) the
wall time of the device step (dispatch + execute + host read).  With the
worker processes on (dataset.num_workers > 0) the input wait should be a
few percent of the step; the probe prints both and their ratio.

Usage:
    python tools/probe_loader.py --config configs/stage2.yaml \
        --data_root data/synth1024 [--steps 12] [--workers N]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import argparse
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="configs/stage2.yaml")
    ap.add_argument("--data_root", default="data/synth1024")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--workers", type=int, default=None)
    ap.add_argument("--stage", default="stage2")
    args = ap.parse_args()

    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import Trainer

    overrides = {"dataset": {"data_root": args.data_root},
                 "batch_size": args.batch,
                 "remat": True,
                 "record": {"loss_freq": 10 ** 9, "eval_freq": 10 ** 9}}
    if args.workers is not None:
        overrides["dataset"]["num_workers"] = args.workers
    cfg = load_config(args.config, stage=args.stage, **overrides)
    trainer = Trainer(cfg, exp_dir="/tmp/probe_loader_exp")

    waits, steps = [], []
    for i in range(args.steps):
        t0 = time.perf_counter()
        batch = trainer._device_batch(next(trainer.train_loader))
        t1 = time.perf_counter()
        trainer.state, metrics = trainer.train_step(trainer.state, batch)
        _ = float(metrics["loss"])      # host read = real sync (tunnel)
        t2 = time.perf_counter()
        waits.append(t1 - t0)
        steps.append(t2 - t1)
        print(f"step {i}: input wait {1e3 * (t1 - t0):7.1f} ms, "
              f"device step {1e3 * (t2 - t1):7.1f} ms", flush=True)

    # skip the first two steps (compile + cold queue)
    w = np.median(waits[2:]) if len(waits) > 4 else np.median(waits)
    s = np.median(steps[2:]) if len(steps) > 4 else np.median(steps)
    print(f"\nRESULT workers={cfg.dataset.num_workers} batch={args.batch}: "
          f"median input wait {w * 1e3:.1f} ms vs device step "
          f"{s * 1e3:.1f} ms -> input share "
          f"{100.0 * w / max(w + s, 1e-9):.1f}% of the step")
    trainer.close()


if __name__ == "__main__":
    main()
