"""Direct donation-correctness stress test for the active JAX backend.

Bisecting a trainer-vs-probe stage-2 trajectory divergence: the trainer
jits its step with donate_argnums=(0,) (buffer reuse), probes without.
This drives a donated jit in a shape-mix resembling TrainState (many
leaves, mixed sizes) for N iterations and checks EXACT equality against
an undonated replica and a numpy replica every iteration.

Usage: python tools/probe_donation.py [--iters 200] [--leaves 64]
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import argparse  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=200)
    ap.add_argument("--leaves", type=int, default=64)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    shapes = [(2 ** (3 + i % 8), 2 ** (2 + (i * 7) % 6))
              for i in range(args.leaves)]
    state0 = [rng.normal(size=s).astype(np.float32) for s in shapes]

    def step(state, x):
        out = []
        for i, s in enumerate(state):
            s = s * 0.999 + jnp.tanh(s) * 0.001 + x * (i + 1) * 1e-6
            out.append(s)
        # couple the leaves so corruption anywhere propagates everywhere
        tot = sum(jnp.sum(s) for s in out)
        return [s + tot * 1e-12 for s in out], tot

    donated = jax.jit(step, donate_argnums=(0,))
    plain = jax.jit(step)

    sd = [jnp.asarray(s) for s in state0]
    sp = [jnp.asarray(s) for s in state0]
    for it in range(args.iters):
        x = jnp.float32(it)
        sd, td = donated(sd, x)
        sp, tp = plain(sp, x)
        if it % 20 == 0 or it == args.iters - 1:
            d = max(float(jnp.abs(a - b).max()) for a, b in zip(sd, sp))
            print(f"iter {it}: donated-vs-plain max|delta| = {d:.3e} "
                  f"tot {float(td):.6f} vs {float(tp):.6f}", flush=True)
            if d != 0.0:
                print("DONATION DIVERGENCE DETECTED", flush=True)
                return 1
    print("donation clean over", args.iters, "iters")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
