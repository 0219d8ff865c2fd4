"""Round-3 TPU measurement batch.

Sequential subprocess jobs (ONE TPU job at a time), each with a hard
timeout, one line per job appended to /tmp/tpu_r3_results.log.

Jobs (in order of information value):
  1. terrain_gated   — BASELINE config #3 after the lax.cond spawn gate
                       (round-2 baseline: 37.6 ms/step, compile 565.7 s).
  2. 2d_rp2          — rp=2 at the 2-D 1M grid (4096 lanes): the stacking
                       point the round-2 heuristic never tried
                       (round-2 baseline: rp=1, 4.64 ms/step fast_math).
  3. 3d_rp_auto      — confirm the new cap_pad-aware stack model still
                       picks rp=4 on the 3-D stretch grid
                       (round-2 baseline: 69.6 ms/step rp=4).
"""
import subprocess
import sys
import time

LOG = "/tmp/tpu_r3_results.log"

CHILD_2D = r'''
import math, time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import sph_mountain_waves_tpu.ops.pallas_pairs as pp
RP = {rp}
if RP: pp.ROWS_PER_PROGRAM = RP
from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.common import frame_runner
from sph_mountain_waves_tpu.models.witch_common import WitchConfig
N = {n}
n_rows = max(8, int(round(math.sqrt(N / (400e3 / 26e3) / 1.0746))))
cfg = WitchConfig(n_rows=n_rows, dtype="float32", self_density=True,
                  layout="bucket", skin=0.15, use_pallas=True,
                  lattice_cells=True, lazy_diagnostics=True, fast_math=True)
sys_ = w.make_system(cfg)
state = sys_.freeze()
step = w.make_step(cfg, sys_.engine)
run_frame = frame_runner(step, 100, finalize=w.make_finalize(cfg))
t0 = time.perf_counter()
state = run_frame(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {{time.perf_counter()-t0:.1f}}s", flush=True)
n = sys_.n_built
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    state = run_frame(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    dt = time.perf_counter() - t0
    best = max(best, n * 100 / dt)
print(f"RESULT 2d rp={{RP}} n={{n}} ps={{best:.4g}} ms_step={{n/best*1000:.3f}}")
'''

CHILD_3D = r'''
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
import sph_mountain_waves_tpu.ops.pallas_pairs as pp
RP = {rp}
if RP: pp.ROWS_PER_PROGRAM = RP
from sph_mountain_waves_tpu.models import witch3d as w3
cfg = w3.stretch_config(bucket_cap=8)
sys_ = w3.make_system(cfg)
state = sys_.freeze()
step = w3.make_step(cfg, sys_.engine)
n = sys_.n_built
print("built n =", n, flush=True)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=20)
    return s
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {{time.perf_counter()-t0:.1f}}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / 20)
print(f"RESULT 3d rp={{RP}} n={{n}} ms_step={{best*1000:.1f}} ps={{n/best:.4g}}")
'''

CHILD_TERRAIN = r'''
# BASELINE config #3: flow over terrain (~213k, inflow recycling + wave drag)
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import legacy_witch as lw
cfg = lw.terrain_baseline_config(use_pallas={up}, fast_math={up})
sys_ = lw.make_system(cfg)
sys_.freeze_opts["capacity"] = int(sys_.n_built * 1.3)
sys_.freeze_opts["rescatter_mode"] = "sort"  # spawn pool teleports rows
sys_.freeze_opts["layout"] = "bucket"
sys_.freeze_opts["skin"] = 0.15
state = sys_.freeze()
step = lw.make_step(cfg, sys_.engine)
n = sys_.n_built
print("built n =", n, flush=True)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=50)
    return s
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {{time.perf_counter()-t0:.1f}}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / 50)
F = lw.mountain_force(state)
print(f"RESULT terrain pallas={{cfg.use_pallas}} n={{n}} "
      f"ms_step={{best*1000:.3f}} ps={{n/best:.4g}} "
      f"drag={{float(F['drag']):.4g}}")
'''


def run_job(name, code, timeout_s):
    with open(LOG, "a") as f:
        f.write(f"--- {name} start {time.strftime('%H:%M:%S')}\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s, check=False)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-8:])
        with open(LOG, "a") as f:
            f.write(f"{name} rc={r.returncode}\n{tail}\n")
        return r.returncode == 0 and "RESULT" in r.stdout
    except subprocess.TimeoutExpired:
        with open(LOG, "a") as f:
            f.write(f"{name} TIMEOUT after {timeout_s}s\n")
        return False


def main():
    jobs = sys.argv[1:] or ["terrain", "rp2", "rp3d"]
    if "terrain" in jobs:
        run_job("terrain_gated_pallas", CHILD_TERRAIN.format(up="True"), 2400)
    if "rp2" in jobs:
        run_job("2d_rp2", CHILD_2D.format(rp="2", n="1e6"), 1800)
    if "rp1" in jobs:
        run_job("2d_rp1", CHILD_2D.format(rp="1", n="1e6"), 1800)
    if "rp3d" in jobs:
        run_job("3d_rp_auto", CHILD_3D.format(rp="None"), 3600)
    with open(LOG, "a") as f:
        f.write("BATCH DONE\n")


if __name__ == "__main__":
    main()
