"""TPU measurement batch for when the tunnel returns.

Sequential subprocess jobs (ONE TPU job at a time), each with a hard
timeout. Validates the committed-but-unmeasured rp-stacking change
against the recorded baselines (BENCHMARKS.md):
  - 2-D 1M fast_math: 4.64 ms/step (2.11e8 ps/s)   [rp=1-era binary]
  - 3-D stretch 3.25M: 96.3 ms/step (3.37e7 ps/s)  [rp=1-era binary]
Writes one line per job to /tmp/tpu_batch_results.log.
"""
import subprocess, sys, time, os

LOG = "/tmp/tpu_batch_results.log"

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
state = run_frame(state)
float(jnp.sum(state.fields["x"][:, 1]))
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

CHILD_DAM = r'''
# BASELINE config #1: collapse_dry dam break (~10k), TPU wall number.
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import collapse_dry as cd
from sph_mountain_waves_tpu.models.common import frame_runner
cfg = cd.Config(dr=0.014, dtype="float32", layout="bucket", skin=0.15,
                use_pallas=True)  # ~10.2k fluid + walls
sys_ = cd.make_system(cfg)
state = sys_.freeze()
step, init_forces = cd.make_step(cfg, sys_.engine)
state = jax.jit(init_forces, donate_argnums=0)(state)
run_frame = frame_runner(step, 200)
state = run_frame(state)
float(jnp.sum(state.fields["x"][:, 1]))
n = sys_.n_built
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    state = run_frame(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = max(best, n * 200 / (time.perf_counter() - t0))
print(f"RESULT dam n={n} ps={best:.4g} ms_step={n/best*1000:.4f} dt={cfg.dt:.3e}")
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
cfg = w3.stretch_config(bucket_cap=8)  # the 96.3 ms/step recorded config
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


CHILD_ISPH = r'''
import math, time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import isph_witch as iw
cfg = iw.baseline_config()
sys_ = iw.make_system(cfg)
state = sys_.freeze()
step = iw.make_step(cfg, sys_.engine)
n = sys_.n_built
print("built n =", n, flush=True)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=20)
    return s
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / 20)
print(f"RESULT isph n={n} ms_step={best*1000:.2f} ps={n/best:.4g}")
'''

CHILD_RB = r'''
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import rayleigh_benard as rb
cfg = rb.baseline_config()
sys_ = rb.make_system(cfg)
state = sys_.freeze()
step = rb.make_step(cfg, sys_.engine)
n = sys_.n_built
print("built n =", n, flush=True)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=100)
    return s
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / 100)
print(f"RESULT rb n={n} ms_step={best*1000:.3f} ps={n/best:.4g}")
'''


CHILD_TERRAIN = r'''
# BASELINE config #3: flow over terrain (~213k, inflow recycling + wave drag)
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import legacy_witch as lw
cfg = lw.terrain_baseline_config(use_pallas={up}, fast_math={up})
# make_system wires the production engine defaults from the config
# (bucket layout, skin-0.6 cells, sort rescatter, spawn-pool capacity)
sys_ = lw.make_system(cfg)
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
    # 2-D rp-auto first: cheapest compile, answers the headline question
    ok2 = run_job("2d_rp_auto", CHILD_2D.format(rp="None", n="1e6"), 1800)
    # 3-D rp-auto: the change mainly targets 3-D (nx=384, op-latency-bound)
    ok3 = run_job("3d_rp_auto", CHILD_3D.format(rp="None"), 3600)
    if not ok2:
        run_job("2d_rp_1", CHILD_2D.format(rp="1", n="1e6"), 1800)
    # BASELINE per-config numbers
    run_job("witch_200k", CHILD_2D.format(rp="None", n="2e5"), 1800)
    run_job("isph_200k", CHILD_ISPH, 2400)
    run_job("rb_51k", CHILD_RB, 1800)
    run_job("dam_10k", CHILD_DAM, 1800)
    if not run_job("terrain_213k_pallas", CHILD_TERRAIN.format(up="True"),
                   2400):
        run_job("terrain_213k_xla", CHILD_TERRAIN.format(up="False"), 2400)
    with open(LOG, "a") as f:
        f.write(f"BATCH DONE ok2={ok2} ok3={ok3}\n")


if __name__ == "__main__":
    main()
