"""Benchmark: particle-steps/sec/chip on the 2-D mountain-wave case.

Runs the flagship WCSPH mountain-wave scheme (float32) at ~1M particles on
the available accelerator, times steady-state jitted frames (compile
excluded), and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
1e8 particle-steps/sec/chip at 1M particles on one v5e (the reference
publishes no throughput numbers — BASELINE.md).

Usage: python bench.py [--particles 1000000] [--steps 20] [--repeats 3]
"""
from __future__ import annotations

import argparse
import json
import math
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=float, default=1e6)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skin", type=float, default=0.2)
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--self-density", action="store_true", default=True)
    args = ap.parse_args()

    import jax

    from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
    from sph_mountain_waves_tpu.models.common import frame_runner
    from sph_mountain_waves_tpu.models.witch_common import WitchConfig

    # pick n_rows so built particle count ≈ target (N ≈ n_rows^2 * L/H / hex_a)
    target = args.particles
    n_rows = max(8, int(round(math.sqrt(target / (400e3 / 26e3) / 1.0746))))

    def build(use_pallas):
        cfg = WitchConfig(n_rows=n_rows, dtype="float32", self_density=True,
                          layout="bucket", skin=args.skin,
                          use_pallas=use_pallas)
        sys_ = w.make_system(cfg)
        state = sys_.freeze()
        step = w.make_step(cfg, sys_.engine)
        return sys_, state, frame_runner(step, args.steps)

    def sync(state):
        # force a full device->host round trip: block_until_ready alone is
        # not a reliable barrier on the experimental remote (axon) platform
        return float(jax.numpy.sum(state.fields["x"][:, 1]))

    # warmup: compile + one frame; fall back to the pure-XLA path if the
    # Pallas kernels fail to compile on this platform
    try:
        sys_, state, run_frame = build(args.pallas)
        state = run_frame(state)
        sync(state)
    except Exception:
        if not args.pallas:
            raise
        sys_, state, run_frame = build(False)
        state = run_frame(state)
        sync(state)
    n = sys_.n_built

    best = 0.0
    times = []
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        state = run_frame(state)
        sync(state)
        dt = time.perf_counter() - t0
        times.append(dt)
        best = max(best, n * args.steps / dt)

    result = {
        "metric": "particle-steps/sec/chip (2D mountain-wave WCSPH, "
                  f"N={n}, {jax.devices()[0].device_kind})",
        "value": round(best, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(best / 1e8, 4),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
