"""Round-4 ridge-resolution test for the linear-drag deficit.

The filtered observable cleaned the measurement: alpha=0 reads
+0.171*D_lin +- 0.06 (r4_drag_scan) — a real generation deficit, not
noise. Hypothesis: the 3-row ridge (h_m = 300 m at dr = 100, kernel
h0 = 180 m) radiates far under theory because the kernel smooths most of
the ridge away (D ~ h_m_eff^2), plus the flux decays with height
(7.9k @3 km -> 5.2k @5.5 km: turbulent dissipation ~ e^{-z/6 km}).

Runs (sequential, one tunnel):
 1. h_m = 600 m, dr = 100 (6-row ridge, eps = N*h_m/U = 0.59 - weakly
    nonlinear, O(20-30%) theory error acceptable for a 3x-resolution
    diagnostic): if the ratio jumps well above 0.17, generation is
    resolution-limited.
 2. h_m = 300 m, dr = 50 (n_rows = 400; 6-row ridge at the LINEAR
    amplitude): the VERDICT-prescribed point, ~4x particles.
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from linear_drag import run

run(n_rows=200, t_end=3000.0, use_pallas=True, verbose=True,
    avg_window=0.4, av_alpha=0.0, h_m=600.0)
run(n_rows=400, t_end=2500.0, use_pallas=True, verbose=True,
    avg_window=0.4, av_alpha=0.0)
