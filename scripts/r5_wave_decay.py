"""Round-5 internal-wave propagation probe: can the adiabatic scheme
CARRY a linear mountain wave at all?

The flux-profile campaign measured the stationary wave ~3× weaker than
linear theory at EVERY height (z-flat deficit, BENCHMARKS.md round-5
section), which implicates generation — but a z-flat deficit could also
be produced by dissipation acting on the ~300 s it takes the wave to
form locally. This isolates propagation: the arm-B analytic wave field
(hₘ=300 witch solution, velocity only) is superposed on the FLAT-floor
(h_m=0, lj_floor) equilibrium and the amplitude profile is tracked for
two buoyancy periods. Velocity-only init splits the energy into up- and
down-going halves (net flux ~0), so the observable is AMPLITUDE:

  - clean propagation → RMS ū′ per level holds ≈ its initial value
    (±the up/down split's standing-wave beating at period 2π/N);
  - scheme dissipation → e-fold decay within the probe window, and the
    stationary-wave deficit is re-attributed to damping-during-buildup.

Run: python scripts/r5_wave_decay.py [cpu] [n_rows]
Appends DECAY lines to /tmp/r5_wave_decay.log.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

if "cpu" in sys.argv[1:]:
    jax.config.update("jax_platforms", "cpu")
    sys.argv.remove("cpu")

import jax.numpy as jnp  # noqa: E402


def main(n_rows=200, t_end=700.0):
    from sph_mountain_waves_tpu.models import legacy_witch as lw

    ref = lw.adiabatic_flow_config()
    N_ref = ref.g / float(np.sqrt(ref.cp * ref.T0))
    cfg = lw.adiabatic_flow_config(
        n_rows=n_rows, dom_height=20e3, dom_length=60e3, z_b=8e3,
        h_m=0.0, a=5e3, t_end=t_end, n_frames=24, dtype="float32",
        use_pallas=True, fast_math=True,
        true_rayleigh=True, consistent_entropy=True,
        sponge_gamma=0.5 * N_ref, lattice_cells=True, lj_floor=True,
        outflow_buffer=6.0 * 1.8 * (20e3 / n_rows))
    U, h_m, a = cfg.U_max, 300.0, 5e3
    N_bv = cfg.g / float(np.sqrt(cfg.cp * cfg.T0))
    m_w = N_bv / U

    def wave(x, y):
        denom = a**2 + x**2
        ph = m_w * y
        zeta_x = h_m * a * (-jnp.sin(ph) * denom
                            - 2 * x * (a * jnp.cos(ph)
                                       - x * jnp.sin(ph))) / denom**2
        zeta_z = h_m * a * m_w * (-a * jnp.sin(ph)
                                  - x * jnp.cos(ph)) / denom
        return -U * zeta_z, U * zeta_x

    levels = [1000, 1500, 2000, 2500, 3000, 4000, 5000]
    amp = lw.wave_amplitude_profile(cfg, [float(z) for z in levels],
                                    dz=1000.0, x_window=3 * a)

    def setup_wave(state):
        f = state.fields
        x, y = f["x"][:, 0], f["x"][:, 1]
        up, wp = wave(x, y)
        # taper: wave only between 0.5 and 6.5 km and |x| <= 4a (smooth
        # edges over 500 m / a respectively to avoid shock edges)
        tz = (jnp.clip((y - 500.0) / 500.0, 0, 1)
              * jnp.clip((6500.0 - y) / 500.0, 0, 1))
        tx = jnp.clip((4 * a - jnp.abs(x)) / a, 0, 1)
        fl = state.active & (f["type"] == lw.FLUID)
        dv = jnp.stack([up, wp], -1) * (tz * tx)[:, None]
        return state.replace(v=jnp.where(fl[:, None], f["v"] + dv, f["v"]))

    t0 = time.time()
    res = lw.run(cfg, verbose=True, extra_diag=amp,
                 setup_hook=setup_wave)
    wall = time.time() - t0
    Tb = 2 * np.pi / N_bv
    for z in levels:
        s = np.asarray(res[f"ampu{z}"])
        line = (f"DECAY z={z} amp0={s[0]:.2f} "
                + " ".join(f"{v:.2f}" for v in s))
        print(line, flush=True)
        with open("/tmp/r5_wave_decay.log", "a") as fh:
            fh.write(line + "\n")
    print(f"buoyancy period {Tb:.0f}s, frames every "
          f"{cfg.t_end / 24:.0f}s, wall={wall:.0f}s", flush=True)


if __name__ == "__main__":
    main(*(int(v) for v in sys.argv[1:]))
