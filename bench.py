"""Benchmark: particle-steps/sec/chip on the 2-D mountain-wave case.

Runs the flagship WCSPH mountain-wave scheme (float32) at ~1M particles on
the available accelerator, times steady-state jitted frames (compile
excluded), and prints ONE JSON line:

  {"metric": "...", "value": N, "unit": "...", "vs_baseline": N}

vs_baseline is measured against the BASELINE.json north-star target of
1e8 particle-steps/sec/chip at 1M particles on one v5e (the reference
publishes no throughput numbers — BASELINE.md).

Robustness contract (VERDICT round 1): the axon TPU tunnel can throw
backend-level JaxRuntimeError/FailedPrecondition at any point (flakes,
device held by another process) — and a fully DOWN tunnel makes jax
backend init HANG indefinitely rather than fail. The orchestrating parent
therefore never initializes jax itself: it probes the tunnel in a
subprocess with a hard timeout, runs every measurement attempt in a
subprocess with a hard timeout (Pallas first, then pure-XLA), falls back
to a CPU subprocess at small N, and emits a JSON line on EVERY exit path
with rc=0 so the driver always records a parsed result — bounded overall
by --budget seconds of wall clock.

Usage: python bench.py [--particles 1000000] [--steps 20] [--repeats 3]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import subprocess
import sys
import time

NORTH_STAR = 1e8  # particle-steps/s/chip at 1M (BASELINE.json)


def parse_args(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--particles", type=float, default=1e6)
    # Steps per timed scan. The axon tunnel costs ~25-30 ms per
    # dispatch+sync round trip and there is NO true per-iteration scan
    # cost (round-4 probes, scripts/scan_floor_probe.py: identity scans
    # at L = 16/128/1024 all cost the same ~26 ms TOTAL, scalar or 1M
    # carry — the round-3 "0.33 ms/iter floor" was this fixed cost
    # divided by a 100-step scan). Default 0 = auto: enough steps that
    # the round trip is < 2% of the measurement — a ~1.5 s scan, i.e.
    # round(1.5 s/est_step/100)*100 = 300 at 1M, rising to the 2000-step
    # cap below ~150k. Production frames run hundreds of steps per scan, and
    # real (untunneled) TPU hosts have no such latency at all.
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skin", type=float, default=0.15)
    ap.add_argument("--pallas", action=argparse.BooleanOptionalAction,
                    default=True)
    ap.add_argument("--self-density", action=argparse.BooleanOptionalAction,
                    default=True, dest="self_density")
    ap.add_argument("--fast-math", action=argparse.BooleanOptionalAction,
                    default=True, dest="fast_math",
                    help="approximate VPU reciprocals in the momentum pair "
                         "body (measured 2.7e-6 rel error on u_max after "
                         "200 steps at 1M — BENCHMARKS.md)")
    ap.add_argument("--force-cpu", action="store_true",
                    help="run on the local CPU backend (fallback mode)")
    ap.add_argument("--attempt", action="store_true", help=argparse.SUPPRESS)
    ap.add_argument("--budget", type=float, default=4200.0,
                    help="total wall-clock budget (s) for the orchestrating "
                         "parent: probes + attempts + CPU fallback")
    return ap.parse_args(argv)


def run_once(args, use_pallas: bool):
    """One full build+warmup+timed attempt. Raises on any failure."""
    import jax

    from sph_mountain_waves_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # cold remote compiles are paid once, not per run

    from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
    from sph_mountain_waves_tpu.models.common import frame_runner
    from sph_mountain_waves_tpu.models.witch_common import WitchConfig

    # pick n_rows so built particle count ≈ target (N ≈ n_rows^2 * L/H / hex_a)
    n_rows = max(8, int(round(math.sqrt(
        args.particles / (400e3 / 26e3) / 1.0746))))

    # lazy_diagnostics: T/θ materialize once per frame (inside the timed
    # jit via finalize) instead of every step — trajectories identical
    # lattice_cells: bucket cells sized to exact hex-lattice pitch (2a, 2b)
    # -> occupancy uniformly 4, q-trip count 4 instead of 6 (the aliased
    # isotropic grid catches a 3rd lattice row in some cells)
    cfg = WitchConfig(n_rows=n_rows, dtype="float32",
                      self_density=args.self_density,
                      layout="bucket", skin=args.skin,
                      use_pallas=use_pallas, lazy_diagnostics=True,
                      lattice_cells=True, fast_math=args.fast_math)
    sys_ = w.make_system(cfg)
    state = sys_.freeze()
    step = w.make_step(cfg, sys_.engine)
    if not args.steps:
        # auto scan length: keep the fixed ~30 ms tunnel round trip < 2%
        # of the timed chunk (expected step time ~ n/2e8 s; scan compiles
        # the body once, so longer scans cost no extra compile)
        est_step_s = max(sys_.n_built / 2.0e8, 2e-4)
        args.steps = int(min(2000, max(100, round(1.5 / est_step_s / 100)
                                       * 100)))
    run_frame = frame_runner(step, args.steps,
                             finalize=w.make_finalize(cfg))

    def sync(st):
        # force a full device->host round trip: block_until_ready alone is
        # not a reliable barrier on the experimental remote (axon) platform
        return float(jax.numpy.sum(st.fields["x"][:, 1]))

    state = run_frame(state)  # warmup: compile + one frame
    sync(state)
    n = sys_.n_built

    best = 0.0
    for _ in range(args.repeats):
        t0 = time.perf_counter()
        state = run_frame(state)
        sync(state)
        dt = time.perf_counter() - t0
        best = max(best, n * args.steps / dt)
    return best, n, jax.devices()[0].device_kind


def emit(best: float, n, kind: str, note: str = "") -> None:
    tag = f", {note}" if note else ""
    print(json.dumps({
        "metric": "particle-steps/sec/chip (2D mountain-wave WCSPH, "
                  f"N={n}, {kind}{tag})",
        "value": round(best, 1),
        "unit": "particle-steps/s",
        "vs_baseline": round(best / NORTH_STAR, 4),
    }))


def _forward_json(stdout: str) -> bool:
    """Find the contractual JSON line in a child's stdout and reprint it.
    Crash-diagnostic lines (value 0.0 from the __main__ guard) are not
    results — rejecting them keeps the parent's retry/fallback chain alive."""
    for line in stdout.splitlines():
        line = line.strip()
        if (line.startswith("{") and '"vs_baseline"' in line
                and '"bench crashed' not in line):
            print(line)
            return True
    return False


def _probe_tpu(timeout_s: float = 150.0) -> bool:
    """True iff an accelerator backend initializes and computes, within a
    hard subprocess timeout (a down axon tunnel HANGS jax init — it does
    not fail fast, so this must never run in the parent process)."""
    code = ("import jax, jax.numpy as jnp\n"
            "assert jax.devices()[0].platform != 'cpu', jax.devices()\n"
            "print(float(jnp.sum(jnp.ones((8, 128)))))\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s, check=False)
        return r.returncode == 0
    except (subprocess.TimeoutExpired, OSError):
        return False


def _attempt_cmd(args, use_pallas: bool) -> list:
    return [sys.executable, os.path.abspath(__file__), "--attempt",
            "--particles", str(args.particles), "--steps", str(args.steps),
            "--repeats", str(args.repeats), "--skin", str(args.skin),
            "--pallas" if use_pallas else "--no-pallas",
            "--self-density" if args.self_density else "--no-self-density",
            "--fast-math" if args.fast_math else "--no-fast-math"]


def main() -> None:
    args = parse_args()
    t_end = time.time() + args.budget

    if args.force_cpu:
        # fallback subprocess mode: must reconfigure before backend init
        # (sitecustomize registers axon but does not initialize backends)
        import jax
        jax.config.update("jax_platforms", "cpu")

    if args.attempt or args.force_cpu:
        # Child mode: one in-process build+run per (pallas, sleep) retry.
        # CPU-backend flakes don't exist, so force_cpu keeps a short local
        # schedule; --attempt children get exactly one shot (the parent
        # owns the retry/backoff policy and the watchdog timeouts).
        schedule = [(args.pallas and not args.force_cpu, 0)]
        if args.force_cpu:
            schedule = [(False, 0), (False, 15), (False, 60)]
        last_err = None
        for use_pallas, sleep_s in schedule:
            if sleep_s:
                time.sleep(sleep_s)
            try:
                best, n, kind = run_once(args, use_pallas)
                emit(best, n, kind, "" if use_pallas else "xla-path")
                return
            except Exception as e:  # noqa: BLE001
                last_err = e
                print(f"bench attempt failed (pallas={use_pallas}): "
                      f"{type(e).__name__}: {e}", file=sys.stderr)
        if args.attempt:
            # os._exit: a plain sys.exit(1) would be caught by __main__'s
            # BaseException guard, which prints a rc=0 crash JSON that the
            # parent would forward as the final result, skipping every
            # remaining retry/fallback
            sys.stderr.flush()
            os._exit(1)  # parent decides what happens next
        emit(0.0, 0, "unavailable",
             f"all attempts failed: {type(last_err).__name__}")
        return

    # ---- parent: never touches jax; every jax process is under a timeout.
    last_note = "tpu probe never succeeded"
    tpu_up = False
    for sleep_s in (0, 30, 60, 120, 180):
        if time.time() + sleep_s > t_end - 900:
            break  # keep enough budget for the CPU fallback
        time.sleep(sleep_s)
        if _probe_tpu():
            tpu_up = True
            break
        print("tpu probe failed (down tunnel or hung init)", file=sys.stderr)

    if tpu_up:
        # Pallas is ~5x the XLA path — worth several retries (tunnel
        # flakes, Mosaic remote-compile HTTP 500) before downgrading.
        schedule = [(args.pallas, 0), (args.pallas, 30), (args.pallas, 120),
                    (False, 30), (False, 60)]
        if not args.pallas:
            schedule = [(False, 0), (False, 15), (False, 60)]
        for use_pallas, sleep_s in schedule:
            remaining = t_end - time.time() - 900
            if remaining < 120:
                last_note = "budget exhausted"
                break
            time.sleep(min(sleep_s, remaining))
            try:
                r = subprocess.run(_attempt_cmd(args, use_pallas),
                                   capture_output=True, text=True,
                                   timeout=min(2400.0, remaining),
                                   check=False)
            except (subprocess.TimeoutExpired, OSError) as e:
                print(f"attempt watchdog fired (pallas={use_pallas}): "
                      f"{type(e).__name__}", file=sys.stderr)
                last_note = "attempt timeout"
                continue
            # Mosaic remote-compile failures bury the real cause mid-log
            # ("AOT PJRT error" — CLAUDE.md); surface those lines before the
            # generic tail so the driver log stays actionable
            marked = [ln for ln in r.stderr.splitlines()
                      if "AOT PJRT error" in ln]
            for ln in marked[:5]:
                print(ln, file=sys.stderr)
            sys.stderr.write(r.stderr[-2000:])
            if r.returncode == 0 and _forward_json(r.stdout):
                return
            last_note = f"attempt rc={r.returncode}"

    # Accelerator unusable: measure on local CPU in a fresh process at
    # small N so the driver still records a real (if modest) number.
    try:
        cmd = [sys.executable, os.path.abspath(__file__), "--force-cpu",
               "--particles", "25000", "--steps", "10", "--repeats", "2",
               "--no-pallas"]
        out = subprocess.run(cmd, capture_output=True, text=True,
                             timeout=max(120.0, t_end - time.time()),
                             check=False)
        if _forward_json(out.stdout):
            return
        print(f"cpu fallback produced no JSON (rc={out.returncode}): "
              f"{out.stderr[-500:]}", file=sys.stderr)
    except Exception as e:  # noqa: BLE001
        print(f"cpu fallback failed: {type(e).__name__}: {e}",
              file=sys.stderr)

    # ultimate fallback: a diagnostic JSON line, still rc=0
    emit(0.0, 0, "unavailable", last_note)


if __name__ == "__main__":
    try:
        main()
    except BaseException as e:  # noqa: BLE001 — the line must always print
        print(json.dumps({
            "metric": f"bench crashed: {type(e).__name__}: {e}"[:200],
            "value": 0.0, "unit": "particle-steps/s", "vs_baseline": 0.0,
        }))
        if isinstance(e, KeyboardInterrupt):
            raise
    sys.exit(0)
