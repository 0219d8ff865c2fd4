"""Terrain step profiling on TPU: time the full step and ablations.

Variants (each its own subprocess, ONE at a time):
  full      — lattice_cells + floors + cumsum spawn (the new production path)
  nospawn   — add_new_particles + set_inflow_speed removed (physics only)
  rebuild   — accelerate/move/rebuild only (no pair passes, no EOS)
Appends results to /tmp/tpu_terrain_prof.log.
"""
import subprocess
import sys
import time

LOG = "/tmp/tpu_terrain_prof.log"

CHILD = r'''
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import legacy_witch as lw
from sph_mountain_waves_tpu.ops.apply import apply_unary

VARIANT = "{variant}"
cfg = lw.terrain_baseline_config(use_pallas=True, fast_math=True)
sys_ = lw.make_system(cfg)
state = sys_.freeze()
eng = sys_.engine
print("cap", eng.cap, "lims", eng.lims, "slots", eng.slots, flush=True)
full_step = lw.make_step(cfg, eng)

if VARIANT == "full":
    step = full_step
elif VARIANT == "nospawn":
    import dataclasses
    step = lw.make_step(dataclasses.replace(cfg, max_spawn=0), eng)
elif VARIANT == "rebuild":
    def step(s):
        s = apply_unary(s, lambda u: {{"x": u.x + cfg.dt * u.v}})
        s, _ = eng.rebuild(s)
        return s

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
n = sys_.n_built
print(f"RESULT terrain_{{VARIANT}} n={{n}} ms_step={{best*1000:.3f}} ps={{n/best:.4g}}")
'''


CHILD_ISPH = r'''
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import isph_witch as iw
cfg = iw.baseline_config(cg_tol={tol}, cg_maxiter={maxiter})
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
print(f"compile+first: {{time.perf_counter()-t0:.1f}}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / 20)
it = float(state.fields["cg_it"][0]); res = float(state.fields["cg_res"][0])
print(f"RESULT isph tol={cfg.cg_tol} maxiter={cfg.cg_maxiter} n={{n}} "
      f"ms_step={{best*1000:.2f}} ps={{n/best:.4g}} cg_it={{it:.0f}} "
      f"cg_res={{res:.2e}}")
'''


def run_job(name, code, timeout_s):
    with open(LOG, "a") as f:
        f.write(f"--- {name} start {time.strftime('%H:%M:%S')}\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s, check=False)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-10:])
        with open(LOG, "a") as f:
            f.write(f"{name} rc={r.returncode}\n{tail}\n")
    except subprocess.TimeoutExpired:
        with open(LOG, "a") as f:
            f.write(f"{name} TIMEOUT after {timeout_s}s\n")


def main():
    variants = sys.argv[1:] or ["full", "rebuild", "nospawn", "isph"]
    for v in variants:
        if v == "isph":
            run_job("isph_obs", CHILD_ISPH.format(tol="1e-6", maxiter="200"),
                    3600)
        elif v.startswith("isph_tol"):
            # e.g. isph_tol1e-4
            run_job(v, CHILD_ISPH.format(tol=v[8:], maxiter="200"), 3600)
        else:
            run_job(f"terrain_{v}", CHILD.format(variant=v), 3600)
    with open(LOG, "a") as f:
        f.write("PROF DONE\n")


if __name__ == "__main__":
    main()
