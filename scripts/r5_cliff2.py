"""Round-5 x-tiling A/B at the ~2M VMEM cliff (VERDICT r4 #3).

Round-4 autopsy: the 2-D flagship drops 2.08e8 → 1.37e8 ps/s between
1.93M (nx 5376) and 2.76M (nx 6400) because the Mosaic kernel stack
(261 B/cap·lane) overflows the scoped-VMEM budget at rp=1 — the pair
programs lose double-buffering headroom. Round 5 tiles wide rows into
column chunks (ops/pallas_pairs._chunk_lanes, auto at nx > ~6000 for
cap 8). This measures:

  - 1M control (nx 2048, untiled — must match the 4.6-4.7 ms baseline)
  - 2.87M and 3.82M on the auto-tiled path (cx=2048)
  - 3.82M at CHUNK_LANES=1024 (chunk-width A/B)

Appends RESULT lines to /tmp/r5_cliff.log. One TPU job at a time
(subprocess isolation per size, same as cliff_probe)."""
import subprocess
import sys
import time

CHILD = r'''
import math, time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import sph_mountain_waves_tpu.ops.pallas_pairs as pp
pp.CHUNK_LANES = {chunk}
from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.common import frame_runner
from sph_mountain_waves_tpu.models.witch_common import WitchConfig
N = {n}
STEPS = {steps}
n_rows = max(8, int(round(math.sqrt(N / (400e3 / 26e3) / 1.0746))))
cfg = WitchConfig(n_rows=n_rows, dtype="float32", self_density=True,
                  layout="bucket", skin=0.15, use_pallas=True,
                  lattice_cells=True, lazy_diagnostics=True, fast_math=True)
sys_ = w.make_system(cfg)
state = sys_.freeze()
run = frame_runner(w.make_step(cfg, sys_.engine), STEPS,
                   finalize=w.make_finalize(cfg))
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
comp = time.perf_counter() - t0
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / STEPS)
n = sys_.n_built
print(f"RESULT r5cliff n={{n}} nx={{sys_.engine.lims[0]}} chunk={chunk} "
      f"steps={{STEPS}} ms_step={{best*1e3:.3f}} ps={{n/best:.4g}} "
      f"compile={{comp:.0f}}s", flush=True)
'''

JOBS = [(3.82e6, 100, "2048")]

if __name__ == "__main__":
    for n, steps, chunk in JOBS:
        code = CHILD.format(n=n, steps=steps, chunk=chunk)
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=3600)
        out = r.stdout + r.stderr
        for line in out.splitlines():
            if line.startswith("RESULT"):
                print(line, flush=True)
                with open("/tmp/r5_cliff.log", "a") as f:
                    f.write(line + "\n")
        if r.returncode != 0:
            print(f"JOB n={n} chunk={chunk} rc={r.returncode} "
                  f"({time.time() - t0:.0f}s)\n" + out[-2000:], flush=True)
