"""Round-5 wave-drag flux-PROFILE campaign (VERDICT r4, Missing #1).

Three TPU runs of the linear-regime mountain-wave experiment
(scripts/linear_drag.py), each with the per-500-m scale-filtered EP-flux
profile (legacy_witch.wave_momentum_flux_profile) riding along, to
localize where the surface drag dies before reaching the 3-km band:

  A. washboard (lattice floor), h_m=600  — is round-4's 0.150 +- 0.021
     BL-eddy leakage (profile growing toward the floor) or wave flux
     (z-independent)?
  B. lj_floor,  h_m=300  — eps = N*h_m/U = 0.29: the first *actually
     linear* free-slip configuration.  The decisive arm.
  C. lj_floor,  h_m=600  — eps = 0.59: localize the 2.55*D_lin (surface
     reaction) -> 0.038*D_lin (3 km) loss.  Low-level breaking would show
     as a sharp profile kink right above the ridge top.

Each appends a RESULT line (linear_drag.run) plus a PROFILE line with the
late-time mean flux per level, both to /tmp/linear_drag.log and
/tmp/r5_profile.log.  Reference physics being probed:
/root/reference/src/legacy/adiabatic_flow_witch.jl:97-174.

Run via scripts/tpu_r4.sh (tunnel probe + flock): one TPU job at a time.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import linear_drag  # noqa: E402

LEVELS = [1000, 1500, 2000, 2500, 3000, 4000, 5000]


def arm(name, **kw):
    print(f"=== arm {name}: {kw} ===", flush=True)
    t0 = time.time()
    res, D, D_lin = linear_drag.run(flux_profile=True, verbose=True, **kw)
    k0 = int(len(res["t"]) * 0.8)
    prof = {z: float(np.mean(np.asarray(res[f"fp{z}"])[k0:])) for z in LEVELS
            if f"fp{z}" in res}
    sem = {z: float(np.std(np.asarray(res[f"fp{z}"])[k0:])
                    / np.sqrt(len(res["t"]) - k0)) for z in prof}
    body = " ".join(f"z{z}={prof[z] / D_lin:.3f}+-{sem[z] / D_lin:.3f}"
                    for z in LEVELS if z in prof)
    line = (f"PROFILE {name} h_m={kw.get('h_m', 300.0)} "
            f"lj={kw.get('lj_floor', False)} D_lin={D_lin:.4g} {body} "
            f"wall={time.time() - t0:.0f}s")
    if f"ampu{LEVELS[0]}" in res:
        amps = {z: (float(np.mean(np.asarray(res[f"ampu{z}"])[k0:])),
                    float(np.mean(np.asarray(res[f"ampw{z}"])[k0:])))
                for z in LEVELS if f"ampu{z}" in res}
        line += "\nAMP " + name + " " + " ".join(
            f"z{z}=u{amps[z][0]:.2f}/w{amps[z][1]:.2f}" for z in amps)
    if "sw0" in res:
        # time-MEAN stationary bins (late frames): the generation
        # diagnostic — stationary wave pattern with unsteady noise
        # averaged out
        nb = sum(1 for k in res if k.startswith("sw"))
        mw = [float(np.mean(np.asarray(res[f"sw{i}"])[k0:]))
              for i in range(nb)]
        mu = [float(np.mean(np.asarray(res[f"su{i}"])[k0:]))
              for i in range(nb)]
        line += ("\nGENW " + name + " "
                 + " ".join(f"{v:.3f}" for v in mw)
                 + "\nGENU " + name + " "
                 + " ".join(f"{v:.3f}" for v in mu))
    print(line, flush=True)
    for path in ("/tmp/linear_drag.log", "/tmp/r5_profile.log"):
        with open(path, "a") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ABC"
    if "A" in which:
        arm("A_washboard600", h_m=600.0, t_end=3000.0, av_alpha=0.0)
    if "B" in which:
        arm("B_lj300", h_m=300.0, t_end=3000.0, av_alpha=0.0, lj_floor=True)
    if "C" in which:
        arm("C_lj600", h_m=600.0, t_end=3000.0, av_alpha=0.0, lj_floor=True)
    if "G" in which:
        # resolution step on generation efficiency (arm-E finding: the
        # stationary w̄ pattern at the source is 0.64 of theory at
        # dr=100 m, u′ 0.27): 1.5× finer. t_end=1500 s ≈ 6 a/U settles
        # the near field; late-30% averaging windows the diagnostics.
        arm("G_lj300_hires", h_m=300.0, t_end=1500.0, av_alpha=0.0,
            lj_floor=True, n_rows=300, avg_window=0.3)
    if "E" in which:
        # sponge-reflection hypothesis (arm-B finding: z-INDEPENDENT
        # ~0.1·D_lin with no kill zone = standing-wave signature): taller
        # domain, sponge ramp deepened 8 km (1.25·λ_z) → 12 km (1.9·λ_z)
        # starting at 16 km. If the flux rises toward D_lin, the deficit
        # was reflected-wave cancellation, not generation/dissipation.
        arm("E_lj300_tall", h_m=300.0, t_end=3000.0, av_alpha=0.0,
            lj_floor=True, dom_height=28e3, z_b=12e3)
