"""Round-4 linear-drag: fluid-fluid-gated AV (alpha=0.05), 2x window.

The round-3 ungated-AV run measured flux -0.10*D_lin with u_avg 19.4 < U
(no-slip floor drag from fluid<->MOUNTAIN approaching pairs). This run
carries the free-slip gate; expectation is the absorbing-sponge wave
signal (+0.35*D_lin round 3 without AV) at the gated-AV noise level
(sigma ~ 0.4*D_lin per frame).
"""
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from linear_drag import run

run(n_rows=200, t_end=3000.0, use_pallas=True, verbose=True,
    avg_window=0.4, av_alpha=0.05)
