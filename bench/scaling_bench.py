#!/usr/bin/env python
"""Data-parallel scaling efficiency over the available device mesh.

On a multi-chip TPU slice this measures real ICI scaling; on a single chip
or CPU it validates the sharded program (use
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu for a
virtual mesh).

Usage: python bench/scaling_bench.py [--res 128] [--iters 5]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run(n_devices, res, iters):
    import jax

    from gps_gaussian_tpu.testing import fake_stereo_batch
    from gps_gaussian_tpu.train import sharding, state as state_lib
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import (make_model,
                                                make_raster_config,
                                                make_sharded_train_step,
                                                make_train_step)

    cfg = load_config(
        None, batch_size=n_devices,
        raster=dict(max_tiles_per_gaussian=8, max_per_tile=512,
                    backend="auto"))
    mesh = sharding.make_mesh(n_devices)
    batch = fake_stereo_batch(batch=n_devices, res=res, novel_res=res)
    batch = sharding.shard_batch(mesh, batch)

    model = make_model(cfg, with_gs=True)
    params = model.init(jax.random.PRNGKey(0), batch,
                        iters=cfg.raft.train_iters)
    state = state_lib.create_state(cfg, params)
    state = state.replace(
        params=sharding.replicate(mesh, state.params),
        opt_state=sharding.replicate(mesh, state.opt_state))
    rcfg = make_raster_config(cfg)
    # the multi-device path is the shard_map step (pallas-compatible)
    mk = (make_sharded_train_step(model, cfg, "stage2", rcfg, mesh)
          if n_devices > 1 else make_train_step(model, cfg, "stage2", rcfg))
    step = jax.jit(mk, donate_argnums=(0,))
    state, m = step(state, batch)
    jax.block_until_ready(m)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, m = step(state, batch)
    jax.block_until_ready(m)
    dt = (time.perf_counter() - t0) / iters
    return n_devices / dt  # pairs/s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=128)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax

    nd = len(jax.devices())
    r1 = run(1, args.res, args.iters)
    rn = run(nd, args.res, args.iters) if nd > 1 else r1
    eff = rn / (r1 * nd) if nd > 1 else 1.0
    print(json.dumps({
        "metric": f"dp_scaling_efficiency_{nd}dev_{args.res}",
        "value": round(eff, 3),
        "unit": "ratio",
        "vs_baseline": round(eff / 0.9, 3),  # target >= 90% (BASELINE.md)
        "pairs_per_s_1dev": round(r1, 2),
        f"pairs_per_s_{nd}dev": round(rn, 2),
    }))


if __name__ == "__main__":
    main()
