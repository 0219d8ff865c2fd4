"""Bisect the LJ-floor TPU worker crash (two clean repros at the first
device read of scripts/r4_drag_lj.py). Each arm is a tiny 2-frame run in
a subprocess; between arms we re-probe the tunnel (a crashing arm kills
the worker for ~8 min). Arms ordered by information value:

  B  lj_floor + XLA pair path      -> crash = program structure, not Pallas
  A  lj_floor + Pallas             -> crash only here = Pallas shape/DMA
  D  lj_floor + Pallas, no diag    -> isolates the extra_diag closures
  C  control (no lj_floor), Pallas -> sanity (matches the av-gated runs)
"""
import subprocess
import sys
import time

ARM = r'''
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
from sph_mountain_waves_tpu.models import legacy_witch as lw
ref = lw.adiabatic_flow_config()
N_ref = ref.g / float(np.sqrt(ref.cp * ref.T0))
n_rows = 200
cfg = lw.adiabatic_flow_config(
    n_rows=n_rows, dom_height=20e3, dom_length=60e3, z_b=8e3,
    h_m=600.0, a=5e3, t_end=15.0, n_frames=2, dtype="float32",
    use_pallas=USE_PALLAS, fast_math=True,
    true_rayleigh=True, consistent_entropy=True,
    sponge_gamma=0.5 * N_ref, lattice_cells=True, lj_floor=LJ,
    outflow_buffer=6.0 * 1.8 * (20e3 / n_rows))
if DIAG:
    fb = lw.wave_momentum_flux_binned(cfg, z0=3e3, dz=2e3, tag="fb",
                                      x_window=15e3)
    ljd = lw.lj_floor_drag(cfg) if LJ else lw.mountain_force(cfg)
    diag = lambda s: {**ljd(s), **fb(s)}
else:
    diag = None
res = lw.run(cfg, verbose=True, extra_diag=diag)
print("ARM_OK n=", int(res["state"].n), flush=True)
'''

ARMS = [
    ("B_lj_xla", dict(LJ=True, USE_PALLAS=False, DIAG=True)),
    ("A_lj_pallas", dict(LJ=True, USE_PALLAS=True, DIAG=True)),
    ("D_lj_pallas_nodiag", dict(LJ=True, USE_PALLAS=True, DIAG=False)),
    ("C_control_pallas", dict(LJ=False, USE_PALLAS=True, DIAG=True)),
]

PROBE = ("import jax, jax.numpy as jnp; "
         "assert jax.devices()[0].platform != 'cpu'; "
         "print(float(jnp.sum(jnp.ones((8,128)))))")


def tunnel_up():
    r = subprocess.run([sys.executable, "-c", PROBE],
                       capture_output=True, timeout=240)
    return r.returncode == 0


def main():
    for name, subs in ARMS:
        for _ in range(12):           # up to ~50 min waiting for recovery
            try:
                if tunnel_up():
                    break
            except subprocess.TimeoutExpired:
                pass
            print(f"{name}: tunnel down, waiting", flush=True)
            time.sleep(240)
        code = ARM
        for k, v in subs.items():
            code = code.replace(k, repr(v))
        t0 = time.time()
        try:
            r = subprocess.run([sys.executable, "-c", code],
                               capture_output=True, text=True, timeout=2400)
            ok = "ARM_OK" in r.stdout
            tail = "\n".join((r.stdout + r.stderr).splitlines()[-4:])
            print(f"ARM {name} rc={r.returncode} ok={ok} "
                  f"wall={time.time()-t0:.0f}s\n{tail}", flush=True)
        except subprocess.TimeoutExpired:
            print(f"ARM {name} TIMEOUT wall={time.time()-t0:.0f}s",
                  flush=True)


if __name__ == "__main__":
    main()
