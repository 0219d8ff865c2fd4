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
kw = dict(use_pallas=True, fast_math=True)
if VARIANT == "fullskin":
    # big drift slack: misaligned cells (cap 16) but ~5x fewer rescatters
    kw.update(lattice_cells=False, skin=0.6)
elif VARIANT == "fullskin1":
    kw.update(lattice_cells=False, skin=1.0)
cfg = lw.terrain_baseline_config(**kw)
sys_ = lw.make_system(cfg)
state = sys_.freeze()
eng = sys_.engine
print("cap", eng.cap, "lims", eng.lims, "slots", eng.slots, flush=True)
full_step = lw.make_step(cfg, eng)

if VARIANT in ("full", "fullskin", "fullskin1"):
    step = full_step
elif VARIANT == "nospawn":
    import dataclasses
    step = lw.make_step(dataclasses.replace(cfg, max_spawn=0), eng)
elif VARIANT == "rebuild":
    def step(s):
        s = apply_unary(s, lambda u: {{"x": u.x + cfg.dt * u.v}})
        s, _ = eng.rebuild(s)
        return s
elif VARIANT == "masspass":
    from sph_mountain_waves_tpu.ops.pallas_pairs import legacy_mass_pass
    def step(s):
        drho = legacy_mass_pass(eng, s, cfg)
        return s.replace(Drho=jnp.where(s.active, drho, 0.0))
elif VARIANT == "forcepass":
    from sph_mountain_waves_tpu.ops.pallas_pairs import legacy_force_pass
    def step(s):
        dv = legacy_force_pass(eng, s, cfg)
        return s.replace(Dv=jnp.where(s.active[:, None],
                                      jnp.stack(dv, axis=-1), 0.0))
elif VARIANT == "unaries":
    # everything in the flow step EXCEPT spawn/rebuild/pair passes
    base = lw.make_step(cfg, eng)  # only to build the closures; unused
    U = cfg.U_max
    def step(s):
        f = s.fields
        fl = (f["type"] == lw.FLUID)[:, None]
        v = jnp.where(fl, f["v"] + 0.5 * cfg.dt * f["Dv"], f["v"])
        x = jnp.where(fl, f["x"] + cfg.dt * v, f["x"])
        rho = f["rho"] + f["Drho"] * cfg.dt
        P = rho * cfg.R_mass * cfg.T0
        Ps = jnp.maximum(P, 1e-6)
        theta = f["T"] * ((f["T"] * cfg.R_gas * cfg.rho0) / Ps) ** (
            cfg.R_gas / cfg.cp)
        inflow = (f["type"] == lw.INFLOW)[:, None]
        v = jnp.where(inflow, jnp.stack(
            [jnp.full_like(f["P"], U), jnp.zeros_like(f["P"])], -1), v)
        return s.replace(v=v, x=x, rho=rho, P=P, theta=theta,
                         Drho=jnp.zeros_like(rho))

@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=50)
    return s
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {{time.perf_counter()-t0:.1f}}s", flush=True)
n = sys_.n_built
n_scans = {n_scans}
best = 1e9
for k in range(n_scans):
    t0 = time.perf_counter()
    state = run(state)
    v = state.fields["v"]
    umax = float(jnp.max(jnp.where(state.active[:, None], jnp.abs(v), 0.0)))
    dt_s = (time.perf_counter() - t0) / 50
    best = min(best, dt_s)
    if n_scans > 3:
        print(f"  scan {{k}}: {{dt_s*1000:.2f}} ms/step umax={{umax:.1f}}",
              flush=True)
print(f"RESULT terrain_{{VARIANT}} n={{n}} ms_step={{best*1000:.3f}} "
      f"ps={{n/best:.4g}} umax={{umax:.1f}}")
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
print(f"RESULT isph tol={tol} maxiter={maxiter} n={{n}} "
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
        elif v == "fullevo":
            # long-run evolution: 40x50 steps, per-scan timing + u_max
            run_job("terrain_fullevo",
                    CHILD.format(variant="full", n_scans=40), 5400)
        else:
            run_job(f"terrain_{v}", CHILD.format(variant=v, n_scans=3), 3600)
    with open(LOG, "a") as f:
        f.write("PROF DONE\n")


if __name__ == "__main__":
    main()
