#!/usr/bin/env python
"""Stage-2 end-to-end train-step throughput (stereo pairs/s/chip).

Usage: python bench/train_bench.py [--res 512] [--batch 2] [--iters 20]
Prints one JSON line.
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--bf16", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--hr", action="store_true",
                    help="2x hi-res novel target (the production stage-2 "
                         "regime: reference config/stage2.yaml use_hr_img)")
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--check-drops", action="store_true",
                    help="run one eager step first and report the "
                         "capacity-cap drop counters (extra compile)")
    args = ap.parse_args()

    import jax

    from gps_gaussian_tpu.testing import fake_stereo_batch
    from gps_gaussian_tpu.train import state as state_lib
    from gps_gaussian_tpu.train.config import load_config
    from gps_gaussian_tpu.train.trainer import (make_model,
                                                make_raster_config,
                                                make_train_step)

    novel_res = args.res * 2 if args.hr else args.res
    # hr splat footprints cover ~4x the tiles of the source res
    cfg = load_config(
        None, batch_size=args.batch, remat=args.remat,
        raft=dict(mixed_precision=args.bf16),
        raster=dict(max_tiles_per_gaussian=16 if args.hr else 8,
                    max_per_tile=4096 if args.hr else 2048,
                    fg_cap=max(args.res * args.res // 4, 1 << 14),
                    pair_budget=(3 * novel_res * novel_res // 2
                                 if args.hr
                                 else 3 * args.res * args.res // 2)),
        dataset=dict(src_res=args.res, use_hr_img=args.hr))

    batch = fake_stereo_batch(batch=args.batch, res=args.res,
                              novel_res=novel_res)
    model = make_model(cfg, with_gs=True)
    params = model.init(jax.random.PRNGKey(0), batch,
                        iters=cfg.raft.train_iters)
    state = state_lib.create_state(cfg, params)
    rcfg = make_raster_config(cfg)
    step_fn = make_train_step(model, cfg, "stage2", rcfg)

    drops = None
    if args.check_drops:
        _, metrics0 = jax.jit(step_fn)(state, batch)
        drops = {k: int(v) for k, v in metrics0.items() if "drop" in k}

    # tunnel-safe timing: chained fori_loop inside one jit, host-read sync,
    # two loop lengths to cancel fixed RPC overhead (see bench.py)
    @jax.jit
    def run(state, n):
        def body(i, st):
            st2, m = step_fn(st, batch)
            return st2
        return jax.lax.fori_loop(0, n, body, state)

    n_small, n_big = 1, 1 + args.iters
    times = {}
    for n in (n_small, n_big):
        out = run(state, n)
        _ = float(out.step)               # host read = real sync
        t0 = time.perf_counter()
        out = run(state, n)
        _ = float(jax.tree_util.tree_leaves(out.params)[0].ravel()[0])
        times[n] = time.perf_counter() - t0
    dt = (times[n_big] - times[n_small]) / (n_big - n_small)
    print(json.dumps({
        "metric": ("stage2_train_pairs_per_s_per_chip_"
                   f"{args.res}{'_hr' + str(novel_res) if args.hr else ''}"),
        "value": round(args.batch / dt, 3),
        "unit": "pairs/s",
        "vs_baseline": None,
        "step_ms": round(dt * 1e3, 1),
        **({"drops": drops} if drops is not None else {}),
    }))


if __name__ == "__main__":
    main()
