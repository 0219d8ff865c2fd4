"""Perf experiment harness: time the flagship step at a given scale with
engine/config overrides. Prints one line per configuration.

Usage: python scripts/exp_timing.py [--particles 1e6] [--steps 20]
           [--caps 16,8] [--pallas/--no-pallas]
Run ONE at a time on the tunneled TPU (contention inflates timings).
"""
from __future__ import annotations

import argparse
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=float, default=1e6)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--caps", type=str, default="16,8")
    ap.add_argument("--skin", type=float, default=0.15)
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
    from sph_mountain_waves_tpu.models.common import frame_runner
    from sph_mountain_waves_tpu.models.witch_common import WitchConfig

    n_rows = max(8, int(round(math.sqrt(
        args.particles / (400e3 / 26e3) / 1.0746))))

    for cap_s in args.caps.split(","):
        cap = int(cap_s) if cap_s != "auto" else None
        cfg = WitchConfig(n_rows=n_rows, dtype="float32", self_density=True,
                          layout="bucket", skin=args.skin,
                          use_pallas=args.pallas)
        sys_ = w.make_system(cfg)
        state = sys_.freeze(cap=cap)
        eng = sys_.engine
        step = w.make_step(cfg, eng)
        run_frame = frame_runner(step, args.steps)
        n = sys_.n_built

        state = run_frame(state)
        float(jnp.sum(state.fields["x"][:, 1]))  # device->host barrier
        best = 0.0
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            state = run_frame(state)
            float(jnp.sum(state.fields["x"][:, 1]))
            dt = time.perf_counter() - t0
            best = max(best, n * args.steps / dt)
        n_now = int(state.n)
        print(f"cap={eng.cap} pallas={args.pallas} N={n} n_now={n_now} "
              f"lims={eng.lims} -> {best:.3e} ps/s "
              f"({n * args.steps * 1e3 / best / args.steps:.2f} ms/step)",
              flush=True)
        assert n_now == n, f"particle loss: {n} -> {n_now}"


if __name__ == "__main__":
    main()
