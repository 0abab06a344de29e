#!/usr/bin/env python
"""Microbenchmarks: gathers / scatters / sorts / transposes at splat sizes.

Decides the implementation strategy for the pack/unpack glue around the
compositing kernel (the measured round-1 bottleneck).
"""

from __future__ import annotations

import argparse
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from bench.utils import timed_loop  # noqa: E402

N = 400_000       # compacted gaussians
P = 2_228_224     # padded pairs (budget + tile padding), mult of 128
NP_ = 3_200_000   # N * K


def run_gathers(t, rng, x16, x128, idx, idx_sorted):
    t("row gather (N,16)[P]", lambda a: jnp.sum(a[0][a[1]]), (x16, idx))
    t("row gather (N,16)[P] sorted idx",
      lambda a: jnp.sum(a[0][a[1]]), (x16, idx_sorted))
    t("row gather (N/8,128)[P]",
      lambda a: jnp.sum(a[0][a[1] % (N // 8)]), (x128, idx))


def run_scatters(t, rng, y16, idx, uidx):
    t("i32 scalar scatter P -> (NP,) unique",
      lambda a: jnp.sum(jnp.zeros((NP_,), jnp.int32).at[a[0]].set(
          jnp.arange(P, dtype=jnp.int32), mode="drop",
          unique_indices=True)[:8]), (uidx,))
    t("row scatter-add (P,16)->(N,16) dup",
      lambda a: jnp.sum(jnp.zeros((N, 16), jnp.float32)
                        .at[a[1]].add(a[0])[:8]), (y16, idx))


def run_sorts(t, rng):
    keys = jnp.asarray(rng.integers(0, 4096, NP_, dtype=np.int32))
    fvals = jnp.asarray(rng.normal(size=(NP_,)).astype(np.float32))
    ivals = jnp.arange(NP_, dtype=jnp.int32)

    def sort_m(m):
        def fn(a):
            ops = (a[0],) + tuple(a[1] + k for k in range(m - 1))
            out = jax.lax.sort(ops, num_keys=1, is_stable=True)
            return sum(jnp.sum(o[:8]) for o in out[:2])
        return fn

    for m in (2, 3, 6):
        t(f"sort 1 i32 key + {m-1} f32 operands", sort_m(m), (keys, fvals))

    t("sort 2 keys (i32,f32) + 1 val (current)",
      lambda a: jnp.sum(jax.lax.sort((a[0], a[1], a[2]), num_keys=2,
                                     is_stable=True)[2][:8]),
      (keys, fvals, ivals))

    def packed_key(a):
        k, f, v = a
        dq = jnp.clip((f * 1e5).astype(jnp.int32), 0, (1 << 19) - 1)
        key = k * (1 << 19) + dq
        out = jax.lax.sort((key, v), num_keys=1, is_stable=True)
        return jnp.sum(out[1][:8])

    t("packed u31 single key + 1 val", packed_key, (keys, fvals, ivals))

    # the backward UNSORT shape: 1 i32 key + 9 f32 gradient operands, at
    # full nK vs pair-budget length — decides whether shrinking nK (K or
    # fg_cap) is worth its drops
    def unsort_m(nlen):
        def fn(a):
            k = a[2][:nlen]
            ops = (k,) + tuple(a[1][:nlen] + c for c in range(9))
            out = jax.lax.sort(ops, num_keys=1, is_stable=True)
            return sum(jnp.sum(o[:8]) for o in out[:2])
        return fn

    t("unsort: key + 9 f32 @ 3.2M", unsort_m(NP_), (keys, fvals, ivals))
    t("unsort: key + 9 f32 @ 1.6M", unsort_m(NP_ // 2),
      (keys, fvals, ivals))


def run_transposes(t, rng, y16):
    t("(P,16) -> (16,P) transpose",
      lambda a: jnp.sum(a[0].T[:, :8]), (y16,))
    x16p = jnp.asarray(rng.normal(size=(16, P)).astype(np.float32))
    t("(16,P) -> (P,16) transpose",
      lambda a: jnp.sum(a[0].T[:8, :]), (x16p,))


def run_misc(t, rng, x16, y16):
    live2m = jnp.asarray(rng.integers(0, 2, 2_097_152, dtype=np.int32))
    t("argsort bool 2M", lambda a: jnp.sum(jnp.argsort(a[0])[:8]), (live2m,))

    def cumsum_compact(a):
        live = a[0]
        pos = jnp.cumsum(live) - 1
        tgt = jnp.where(live > 0, pos, N)
        idx_map = jnp.zeros((N,), jnp.int32).at[tgt].set(
            jnp.arange(live.shape[0], dtype=jnp.int32), mode="drop",
            unique_indices=True)
        return jnp.sum(idx_map[:8])

    t("cumsum+scatter compaction 2M->400k", cumsum_compact, (live2m,))
    t("cumsum 2M i32", lambda a: jnp.sum(jnp.cumsum(a[0])[:8]), (live2m,))
    g3m = jnp.asarray(rng.normal(size=(NP_, 16)).astype(np.float32))
    t("row gather 3.2M rows from (P,16)",
      lambda a: jnp.sum(a[0][a[1] % P][:8]),
      (y16, jnp.asarray(rng.integers(0, NP_, NP_, dtype=np.int32))))
    t("reshape-sum (NP,16)->(N,8,16)->sum",
      lambda a: jnp.sum(a[0].reshape(N, 8, 16).sum(1)[:8]), (g3m,))
    t("row gather 2M rows from (400k,16)",
      lambda a: jnp.sum(a[0][a[1]][:8]),
      (x16, jnp.asarray(rng.integers(0, N, 2_097_152, dtype=np.int32))))
    t("row scatter unique .set 400k->(2M,16)",
      lambda a: jnp.sum(jnp.zeros((2_097_152, 16), jnp.float32)
                        .at[a[1]].set(a[0], mode="drop",
                                      unique_indices=True)[:8]),
      (x16, jnp.asarray(np.sort(rng.permutation(2_097_152)[:N])
                        .astype(np.int32))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sections", type=str, default="all")
    cli = ap.parse_args()
    sections = set(cli.sections.split(","))

    def on(name):
        return "all" in sections or name in sections

    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, N, P, dtype=np.int32))
    idx_sorted = jnp.sort(idx)
    x16 = jnp.asarray(rng.normal(size=(N, 16)).astype(np.float32))
    x128 = jnp.asarray(rng.normal(size=(N // 8, 128)).astype(np.float32))
    y16 = jnp.asarray(rng.normal(size=(P, 16)).astype(np.float32))
    uidx = jnp.asarray(rng.permutation(NP_)[:P].astype(np.int32))

    def t(name, fn, args):
        ms = timed_loop(fn, args)
        print(f"  {name:44s} {ms:8.2f} ms", flush=True)

    if on("gathers"):
        print("== gathers ==")
        run_gathers(t, rng, x16, x128, idx, idx_sorted)
    if on("scatters"):
        print("== scatters ==")
        run_scatters(t, rng, y16, idx, uidx)
    if on("sorts"):
        print("== sorts (3.2M) ==")
        run_sorts(t, rng)
    if on("transposes"):
        print("== transposes ==")
        run_transposes(t, rng, y16)
    if on("misc"):
        print("== misc ==")
        run_misc(t, rng, x16, y16)


if __name__ == "__main__":
    main()
