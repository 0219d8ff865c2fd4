"""Arm G: bucket layout + XLA pair path on TPU (arms B,F = flat+XLA -> crash; A,D,E = bucket+Pallas -> garbage):
fast_math=False (exact divides). CPU (flat AND bucket, XLA) is healthy at
this exact config (u_avg 20.6 after 300 steps); TPU arms A/D
(Pallas+fast_math) read u_avg ~1500 — if E is healthy the approx
reciprocal is interacting with the lj grid's empty below-surface cells."""
import sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp
from sph_mountain_waves_tpu.models import legacy_witch as lw

ref = lw.adiabatic_flow_config()
N_ref = ref.g / float(np.sqrt(ref.cp * ref.T0))
n_rows = 200
cfg = lw.adiabatic_flow_config(
    n_rows=n_rows, dom_height=20e3, dom_length=60e3, z_b=8e3,
    h_m=600.0, a=5e3, t_end=15.0, n_frames=2, dtype="float32",
    use_pallas=False, fast_math=False, layout="bucket",
    true_rayleigh=True, consistent_entropy=True,
    sponge_gamma=0.5 * N_ref, lattice_cells=True, lj_floor=True,
    outflow_buffer=6.0 * 1.8 * (20e3 / n_rows))
res = lw.run(cfg, verbose=True)
st = res["state"]
f = st.fields
act = np.asarray(st.active)
typ = np.asarray(f["type"])
fl = act & (typ == lw.FLUID)
v = np.asarray(f["v"])[fl]
x = np.asarray(f["x"])[fl]
s = np.sqrt((v ** 2).sum(-1))
d = np.asarray(lw._floor_gap(cfg, jnp.asarray(x))[0])
hot = s > 200.0
print(f"ARM_G n={fl.sum()} u_avg={s.mean():.1f} p50={np.percentile(s,50):.1f} "
      f"p99={np.percentile(s,99):.1f} max={s.max():.1f} hot={hot.sum()} "
      f"hot_d_med={np.median(d[hot]) if hot.any() else -1:.0f} "
      f"hot_y_med={np.median(x[hot,1]) if hot.any() else -1:.0f}", flush=True)
