"""Production-shape stage-2 step on hardware: 1024^2 sources, 2048^2 hr
novel target (reference config/stage2.yaml:15, lib/human_loader.py:409),
batch 1 + remat on one v5e chip.

Records: per-step wall time (tunnel dispatch included; the first steps are
discarded), HBM high-water from device memory_stats, and the capacity-cap
drop counters at the shipped stage2.yaml caps.

Usage: python tools/bench_hr2048.py [--steps 8] [--no-remat]
"""

import sys

sys.path.insert(0, "/root/repo")

import argparse
import time

import jax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=8)
    ap.add_argument("--no-remat", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--max-tiles", type=int, default=None,
                    help="override raster.max_tiles_per_gaussian")
    ap.add_argument("--ckpt", default=None,
                    help="warm-start params (partial restore) so gaussian "
                         "scales/opacities are realistic — random init "
                         "saturates the duplication cap at hr")
    args = ap.parse_args()

    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import Trainer

    cfg = load_config(
        "configs/stage2.yaml", stage="stage2",
        **{"dataset": {"data_root": "/root/repo/data/synth1024",
                       "num_workers": 2},
           "batch_size": args.batch,
           "remat": not args.no_remat,
           "record": {"loss_freq": 1000, "eval_freq": 10 ** 9},
           **({"stage1_ckpt": args.ckpt} if args.ckpt else {}),
           **({"raster": {"max_tiles_per_gaussian": args.max_tiles}}
              if args.max_tiles else {})})
    trainer = Trainer(cfg, exp_dir="/tmp/hr2048_exp")

    dev = jax.local_devices()[0]
    times = []
    drops = {}
    for i in range(args.steps):
        batch = trainer._device_batch(next(trainer.train_loader))
        t0 = time.perf_counter()
        trainer.state, metrics = trainer.train_step(trainer.state, batch)
        # force a host read: block_until_ready is unreliable on the tunnel
        loss = float(metrics["loss"])
        dt = time.perf_counter() - t0
        times.append(dt)
        drops = {k: float(v) for k, v in metrics.items() if "drop" in k}
        stats = dev.memory_stats() or {}
        peak = stats.get("peak_bytes_in_use", 0) / 2 ** 30
        print(f"step {i}: {dt * 1e3:.0f} ms loss {loss:.3f} "
              f"peak HBM {peak:.2f} GiB drops {drops}", flush=True)

    steady = times[2:] if len(times) > 4 else times
    ms = float(np.median(steady)) * 1e3
    pairs_s = cfg.batch_size / (ms / 1e3)
    days_100k = 100_000 * (ms / 1e3) / 86400
    stats = dev.memory_stats() or {}
    print(f"\nRESULT batch={cfg.batch_size} remat={cfg.remat}: "
          f"median step {ms:.0f} ms ({pairs_s:.2f} pairs/s/chip), "
          f"100k steps = {days_100k:.2f} days/chip, "
          f"peak HBM {stats.get('peak_bytes_in_use', 0) / 2**30:.2f} GiB, "
          f"drops {drops}")
    trainer.close()


if __name__ == "__main__":
    main()
