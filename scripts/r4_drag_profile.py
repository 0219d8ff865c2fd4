"""Round-4 wind-profile diagnostic run: h_m=600, alpha=0, upstream
mean-wind taps per frame (names the generation-deficit mechanism)."""
import sys
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/scripts")
from linear_drag import run
run(n_rows=200, t_end=3000.0, use_pallas=True, verbose=True,
    avg_window=0.4, av_alpha=0.0, h_m=600.0)
