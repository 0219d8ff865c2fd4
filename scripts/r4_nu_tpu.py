"""Round-4 RB Nu(Ra=1e4) A/B on TPU: rkpm vs cleary conduction, 32 + 48
rows, plus the Ra=1e5 second published point (Ouertatani et al. 2008:
Nu(1e4) = 2.158, Nu(1e5) = 3.91). XLA pair path (rkpm needs it); tiny N
so the TPU wins on scan throughput."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
from sph_mountain_waves_tpu.models import rayleigh_benard as rb

for n_rows, Ra, cond, t_end in ((32, 1e4, "rkpm", 60.0),
                                (48, 1e4, "rkpm", 60.0),
                                (48, 1e4, "cleary", 60.0),
                                (48, 1e5, "rkpm", 30.0),
                                (48, 1e5, "cleary", 30.0)):
    cfg = rb.Config(n_rows=n_rows, aspect=1.0, Ra=Ra, sidewalls="adiabatic",
                    seed_amp=0.3, t_end=t_end, n_frames=20, conduction=cond)
    t0 = time.time()
    out = rb.run(cfg)
    nu = float(np.mean(out["Nu"][-8:]))
    pub = 2.158 if Ra == 1e4 else 3.91
    line = (f"NU_TPU n_rows={n_rows} Ra={Ra:.0e} cond={cond} Nu={nu:.4f} "
            f"(published {pub}, ratio {nu/pub:.3f}) wall={time.time()-t0:.0f}s")
    print(line, flush=True)
    with open("/tmp/nu_tpu.log", "a") as f:
        f.write(line + "\n")
