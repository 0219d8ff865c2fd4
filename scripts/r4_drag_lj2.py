"""Round-4 lj_floor linear-drag production run, post-bisect: the
jnp.interp searchsorted lowering that crashed the worker is gone
(uniform-grid take-lerp), and FM=0/1 (env) selects exact/approx divides
per arm E's verdict on the TPU-only velocity anomaly."""
import os
import sys
import time
sys.path.insert(0, "/root/repo")
import numpy as np
from sph_mountain_waves_tpu.models import legacy_witch as lw

FM = os.environ.get("FM", "0") == "1"


def run_lj():
    ref = lw.adiabatic_flow_config()
    N_ref = ref.g / float(np.sqrt(ref.cp * ref.T0))
    n_rows, h_m, a, t_end = 200, 600.0, 5e3, 3000.0
    cfg = lw.adiabatic_flow_config(
        n_rows=n_rows, dom_height=20e3, dom_length=60e3, z_b=8e3,
        h_m=h_m, a=a, t_end=t_end, n_frames=100, dtype="float32",
        use_pallas=True, fast_math=FM,
        true_rayleigh=True, consistent_entropy=True,
        sponge_gamma=0.5 * N_ref, lattice_cells=True, lj_floor=True,
        outflow_buffer=6.0 * 1.8 * (20e3 / n_rows))
    N_bv = cfg.g / float(np.sqrt(cfg.cp * cfg.T0))
    D_lin = (np.pi / 4) * cfg.rho0 * N_bv * cfg.U_max * cfg.h_m**2
    print(f"LJ2 fm={FM} dr={cfg.dr:.0f} dt={cfg.dt:.4e} D_lin={D_lin:.4g}",
          flush=True)
    fb_lo = lw.wave_momentum_flux_binned(cfg, z0=3e3, dz=2e3, tag="fb_lo",
                                         x_window=3 * a)
    fb_hi = lw.wave_momentum_flux_binned(cfg, z0=5.5e3, dz=2e3, tag="fb_hi",
                                         x_window=3 * a)
    ljd = lw.lj_floor_drag(cfg)

    def wind_taps(state):
        # upstream mean-wind profile: is the 1-km rough-wall boundary
        # layer (the washboard runs' U_eff ~ 9-11 m/s deficit driver)
        # GONE with the free-slip floor?
        import jax.numpy as jnp
        f = state.fields
        sel0 = (state.active & (f["type"] == lw.FLUID)
                & (f["x"][:, 0] > -25e3) & (f["x"][:, 0] < -15e3))
        y = f["x"][:, 1]
        out = {}
        for z in (150, 450, 900, 1500, 3000):
            sel = sel0 & (jnp.abs(y - z) < 150)
            w = sel.astype(f["v"].dtype)
            out[f"u{z}"] = (jnp.sum(w * f["v"][:, 0])
                            / jnp.maximum(jnp.sum(w), 1.0))
        return out

    def diag(state):
        return {**ljd(state), **fb_lo(state), **fb_hi(state),
                **wind_taps(state)}

    t0 = time.time()
    res = lw.run(cfg, verbose=True, extra_diag=diag)
    wall = time.time() - t0
    k0 = int(len(res["t"]) * 0.6)
    Db_lo = float(np.mean(np.asarray(res["fb_lo"])[k0:]))
    Db_hi = float(np.mean(np.asarray(res["fb_hi"])[k0:]))
    D_sfc = float(np.mean(np.asarray(res["drag"])[k0:]))
    sem = float(0.5 * (np.std(np.asarray(res["fb_lo"])[k0:])
                       + np.std(np.asarray(res["fb_hi"])[k0:]))
                / np.sqrt(len(res["t"]) - k0))
    taps = " ".join(
        f"u{z}={float(np.mean(np.asarray(res[f'u{z}'])[k0:])):.1f}"
        for z in (150, 450, 900, 1500, 3000))
    line = (f"RESULT lj_drag fm={FM} n={int(res['state'].n)} h_m={h_m} "
            f"Db_lo={Db_lo:.4g} Db_hi={Db_hi:.4g} D_sfc={D_sfc:.4g} "
            f"D_lin={D_lin:.4g} ratio={(0.5*(Db_lo+Db_hi))/D_lin:.3f}"
            f"+-{sem/D_lin:.3f} sfc_ratio={D_sfc/D_lin:.3f} {taps} "
            f"wall={wall:.0f}s")
    print(line, flush=True)
    with open("/tmp/linear_drag.log", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    run_lj()
