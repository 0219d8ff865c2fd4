"""Round-5 validation measurements (VERDICT r4 Missing #2 + Weak #4).

Sequential single-core CPU jobs (this box has one core — never two at
once):

  ghia1000   Lid-driven cavity at Re=1000, N=100, t_end=10 — the third
             (hardest) Ghia column the reference ships
             (sph_jl/examples/reference/ldc-y2vx.csv, comparison
             cavity_flow.jl:182-220) and the only one still unmeasured.
  cylinder   DFG drag at n_around=<n> (resolution step from round-4's
             n_around=20 / C_D 6.3): C_D should fall toward the published
             5.5795 (cylinder.jl:176). Projects the wall time from the
             first frame and falls back to n_around=28 if n=40 would
             exceed the budget.

Appends RESULT lines to /tmp/r5_validation.log.
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)   # cavity/cylinder default f64
                                            # (round-4 calibrations were f64)

LOG = "/tmp/r5_validation.log"


def note(line):
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")


def ghia1000(N=100, t_end=10.0):
    import os

    from sph_mountain_waves_tpu.models import cavity_flow as cf
    t0 = time.time()
    cfg = cf.Config(N=N, Re=1000.0, t_end=t_end, n_frames=10)
    out = cf.run(cfg, verbose=True)
    ref = np.genfromtxt(
        os.path.join("/root/repo/tests/reference_data", "ldc-y2vx.csv"),
        delimiter=",", names=True)
    ours = np.interp(ref["y"], out["s"], out["v1"])
    err = np.abs(ours - ref["Re1000"])
    note(f"RESULT ghia Re=1000 N={N} t_end={t_end} "
         f"mean_err={err.mean():.4f} max_err={err.max():.4f} "
         f"wall={time.time() - t0:.0f}s")


def cylinder(n_around=40, t_end=5.0, budget_s=6.5 * 3600):
    from sph_mountain_waves_tpu.models import cylinder as cy
    for n in (n_around, 28):
        cfg = cy.Config(n_around=n, t_end=t_end, n_frames=5,
                        dtype="float64")
        # one-frame pilot to project the wall time
        t0 = time.time()
        pilot = cy.run(cy.Config(n_around=n, t_end=t_end / 25,
                                 n_frames=1, dtype="float64"))
        proj = (time.time() - t0) * 25
        note(f"cylinder n_around={n}: projected {proj / 3600:.1f} h")
        if proj <= budget_s:
            t0 = time.time()
            out = cy.run(cfg, verbose=True)
            C_D, C_L = out["C_SPH"]
            note(f"RESULT cylinder n_around={n} t_end={t_end} "
                 f"C_D={C_D:.4f} C_L={C_L:.5f} "
                 f"rel_err={abs(C_D / 5.57953523384 - 1):.4f} "
                 f"wall={time.time() - t0:.0f}s")
            return
    note("RESULT cylinder SKIPPED (over budget at both resolutions)")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    if which in ("ghia", "both"):
        ghia1000()
    if which in ("cylinder", "both"):
        cylinder()
