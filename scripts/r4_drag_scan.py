"""Round-4 linear-drag scan with the scale-filtered EP-flux observable.

Sequential TPU runs (ONE tunnel — never concurrent): α = 0 control and
α = 0.02 mild-AV, both with the binned Reynolds-filter bands (the round-4
finding: α = 0.05 suppresses the wave source region while leaving
u_max 50–200 m/s — the floor washboard regenerates eddies faster than AV
damps them, so noise control must live in the OBSERVABLE, not the physics).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from linear_drag import run

for av in (0.0, 0.02):
    run(n_rows=200, t_end=3000.0, use_pallas=True, verbose=True,
        avg_window=0.4, av_alpha=av)
