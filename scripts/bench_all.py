"""Per-config machine-readable bench record (VERDICT r3 #9).

Runs ALL BASELINE.json configs sequentially on the real TPU (one tunnel,
one job at a time, subprocess isolation per config) and writes
``/root/repo/bench_all.json``: a list of records with the same methodology
fields as bench.py (f32, bucket+Pallas, lattice-aligned cells, N-step
timed scans amortizing the ~30 ms tunnel round trip, best of 3, device→
host scalar read as the barrier). Commit the file so the round's numbers
are driver-verifiable rather than transcription.

Usage: python scripts/bench_all.py          (direct, tunnel must be up)
       bash scripts/tpu_r4.sh scripts/bench_all.py   (serialized)
"""
import json
import os
import subprocess
import sys
import time

OUT = "/root/repo/bench_all.json"
LOG = "/tmp/bench_all.log"

HEAD = r'''
import math, time, sys, json
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()   # compile_s below is the cache-warm time after
                            # the first ever run of a config (VERDICT r4
                            # weak #1: the 1953 s terrain cold compile is
                            # a once-per-program-shape tax, not per-run)
def timed_scans(run, state, n, steps, reps=3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    compile_s = time.perf_counter() - t0
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        state = run(state)
        float(jnp.sum(state.fields["x"][:, 1]))
        best = min(best, (time.perf_counter() - t0) / steps)
    print("JSONRESULT " + json.dumps({
        "n": int(n), "ms_per_step": best * 1e3,
        "particle_steps_per_s": n / best, "compile_s": compile_s,
        "steps_per_scan": steps, "repeats": reps}), flush=True)
'''

JOBS = [
    ("witch2d_1m", 1800, HEAD + r'''
from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.common import frame_runner
from sph_mountain_waves_tpu.models.witch_common import WitchConfig
n_rows = max(8, int(round(math.sqrt(1e6 / (400e3 / 26e3) / 1.0746))))
cfg = WitchConfig(n_rows=n_rows, dtype="float32", self_density=True,
                  layout="bucket", skin=0.15, use_pallas=True,
                  lattice_cells=True, lazy_diagnostics=True, fast_math=True)
sys_ = w.make_system(cfg)
state = sys_.freeze()
run = frame_runner(w.make_step(cfg, sys_.engine), 100,
                   finalize=w.make_finalize(cfg))
timed_scans(run, state, sys_.n_built, 100)
'''),
    ("witch3d_stretch", 3600, HEAD + r'''
from sph_mountain_waves_tpu.models import witch3d as w3
from sph_mountain_waves_tpu.models.common import frame_runner
cfg = w3.stretch_config(bucket_cap=8)
sys_ = w3.make_system(cfg)
state = sys_.freeze()
state = w3.setup(cfg, sys_.engine, state)
run = frame_runner(w3.make_step(cfg, sys_.engine), 20,
                   finalize=w3.make_finalize(cfg))
timed_scans(run, state, sys_.n_built, 20)
'''),
    ("terrain_flow", 2400, HEAD + r'''
from sph_mountain_waves_tpu.models import legacy_witch as lw
cfg = lw.terrain_baseline_config(use_pallas=True, fast_math=True)
sys_ = lw.make_system(cfg)
# production spawn path (lw.run parity): slot-targeted spawns under the
# stencil rescatter — no variadic-sort events or their compile cost
sys_.freeze_opts["capacity"] = int(sys_.n_built * 1.3)
if sys_.freeze_opts.get("layout") == "bucket":
    sys_.freeze_opts["rescatter_mode"] = "stencil"
state = sys_.freeze()
step = lw.make_step(cfg, sys_.engine)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=50)
    return s
timed_scans(run, state, sys_.n_built, 50)
'''),
    ("isph_witch", 2400, HEAD + r'''
from sph_mountain_waves_tpu.models import isph_witch as iw
cfg = iw.baseline_config()   # production: precond='mg', cg_tol=1e-4
sys_ = iw.make_system(cfg)
state = sys_.freeze()
step = iw.make_step(cfg, sys_.engine)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=20)
    return s
timed_scans(run, state, sys_.n_built, 20)
'''),
    ("rayleigh_benard", 1800, HEAD + r'''
from sph_mountain_waves_tpu.models import rayleigh_benard as rb
cfg = rb.baseline_config()
sys_ = rb.make_system(cfg)
state = sys_.freeze()
step = rb.make_step(cfg, sys_.engine)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=100)
    return s
timed_scans(run, state, sys_.n_built, 100)
'''),
    ("dam_break", 1800, HEAD + r'''
from sph_mountain_waves_tpu.models import collapse_dry as cd
cfg = cd.Config(dr=0.014, dtype="float32", layout="bucket", skin=0.15,
                use_pallas=True)
sys_ = cd.make_system(cfg)
state = sys_.freeze()
step, init_forces = cd.make_step(cfg, sys_.engine)
state = jax.jit(init_forces, donate_argnums=0)(state)
# 100-step scans, fresh state (round-4-comparable): the 1000-step-scan
# variant (round-5 experiment) by repeat 3 times a state 4000 steps into
# the developed sloshing phase, where drift-triggered rescatters fire
# every ~6 steps and the per-step cost has grown 4.9 -> 44 ms (measured,
# scripts/r5_probe_fix.py) — that regime is recorded as the dam AGING
# curve in BENCHMARKS.md, not as this fresh-state headline. The fixed
# ~26 ms tunnel round trip adds ~0.26 ms/step here (methodology note).
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=100)
    return s
timed_scans(run, state, sys_.n_built, 100)
''')]


def main():
    results = []
    for name, timeout_s, code in JOBS:
        with open(LOG, "a") as f:
            f.write(f"--- {name} start {time.strftime('%H:%M:%S')}\n")
        rec = {"config": name, "ok": False}
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=timeout_s, check=False)
            tail = "\n".join((r.stdout + r.stderr).splitlines()[-6:])
            with open(LOG, "a") as f:
                f.write(f"{name} rc={r.returncode}\n{tail}\n")
            for line in r.stdout.splitlines():
                if line.startswith("JSONRESULT "):
                    rec.update(json.loads(line[len("JSONRESULT "):]))
                    rec["ok"] = True
        except subprocess.TimeoutExpired:
            with open(LOG, "a") as f:
                f.write(f"{name} TIMEOUT {timeout_s}s\n")
            rec["error"] = f"timeout {timeout_s}s"
        results.append(rec)
        # persist incrementally so a crashed batch still leaves a record
        payload = {
            "methodology": (
                "TPU v5e single tunneled chip; f32; bucket layout + Pallas "
                "pair kernels; lattice-aligned cells; lazy diagnostics; "
                "timed lax.scan chunks (steps_per_scan) amortizing the "
                "~30 ms tunnel dispatch+sync; best of `repeats`; device->"
                "host scalar read as barrier; compile excluded"),
            "date": time.strftime("%Y-%m-%d"),
            "results": results}
        with open(OUT, "w") as f:
            json.dump(payload, f, indent=1)
    print(json.dumps(payload["results"], indent=1))


if __name__ == "__main__":
    main()
