"""Round-5 RB Nu convergence arms (VERDICT r4 #4): finish the Ra=1e4
cleary story (48 + 64 rows — is 1.81/1.90/1.95 asymptoting toward the
published 2.158?) and add the Ra=1e5 published point (Ouertatani et al.
2008: Nu(1e4)=2.158, Nu(1e5)=3.91). RKPM is a settled negative (round 4:
Nu 1.13 at 32 rows) — cleary only.

The round-4 48-row/1e5 arms died to a TPU worker crash on the FLAT-layout
program class (CLAUDE.md worker-crash census). Round 5 runs the first arm
on BOTH layouts (flat XLA vs bucket+Pallas — cross-checked operators) and
continues on bucket if they agree, which is also the crash-safe class.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np

from sph_mountain_waves_tpu.models import rayleigh_benard as rb

LOG = "/tmp/r5_nu.log"


def arm(n_rows, Ra, t_end, layout):
    kw = (dict(layout="bucket", skin=0.15, use_pallas=True)
          if layout == "bucket" else {})
    cfg = rb.Config(n_rows=n_rows, aspect=1.0, Ra=Ra, sidewalls="adiabatic",
                    seed_amp=0.3, t_end=t_end, n_frames=20,
                    conduction="cleary", **kw)
    t0 = time.time()
    out = rb.run(cfg)
    nu = float(np.mean(out["Nu"][-8:]))
    pub = 2.158 if Ra == 1e4 else 3.91
    line = (f"NU_R5 n_rows={n_rows} Ra={Ra:.0e} layout={layout} "
            f"Nu={nu:.4f} (published {pub}, ratio {nu / pub:.3f}) "
            f"wall={time.time() - t0:.0f}s")
    print(line, flush=True)
    with open(LOG, "a") as f:
        f.write(line + "\n")
    return nu


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("ab", "all"):
        # NOTE (measured round 5): the FLAT-layout RB program crashed the
        # TPU worker (rc=1, the round-4 flat-program crash class) — the
        # cross-layout A/B lives in the CPU suite instead
        # (test_rayleigh_benard operator gates); TPU runs use bucket.
        nu_flat = arm(48, 1e4, 60.0, "flat")
        nu_buck = arm(48, 1e4, 60.0, "bucket")
        print(f"AB rel diff {abs(nu_flat - nu_buck) / nu_flat:.4f}",
              flush=True)
    if which == "b48":
        arm(48, 1e4, 60.0, "bucket")
    if which in ("deep", "all"):
        arm(64, 1e4, 60.0, "bucket")
        arm(48, 1e5, 30.0, "bucket")
