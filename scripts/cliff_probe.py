"""3.82M-cliff autopsy (VERDICT r3 #10): the 2-D flagship drops
2.11e8 -> 1.24e8 ps/s between 978k and 3.82M with no recorded cause.
Host-side geometry is clean across the range (cap stays 8, lattice-aligned
cells, ~600 MB state at 3.65M — scripts output, round 4), so this measures
the shape of the onset: ps/s at intermediate N, plus a short-scan variant
at the largest size to split fixed-vs-per-step cost.

Appends RESULT lines to /tmp/cliff_probe.log.
"""
import math
import subprocess
import sys
import time

CHILD = r'''
import math, time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
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
print(f"RESULT cliff n={{n}} steps={{STEPS}} ms_step={{best*1e3:.3f}} "
      f"ps={{n/best:.4g}} compile={{comp:.0f}}s", flush=True)
'''

if __name__ == "__main__":
    jobs = [(2.0e6, 100), (2.87e6, 100), (3.4e6, 100),
            (3.82e6, 100), (3.82e6, 20)]
    for n, steps in jobs:
        code = CHILD.format(n=n, steps=steps)
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True,
                               timeout=1800, check=False)
            tail = "\n".join((r.stdout + r.stderr).splitlines()[-4:])
        except subprocess.TimeoutExpired:
            tail = f"TIMEOUT n={n}"
        with open("/tmp/cliff_probe.log", "a") as f:
            f.write(f"--- n={n} steps={steps} {time.strftime('%H:%M:%S')}\n"
                    + tail + "\n")
        print(tail, flush=True)
