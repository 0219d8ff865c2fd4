"""ISPH (incompressible projection) dam-break gates: the matrix-free
preconditioned CG pressure solve must keep the flow nearly incompressible —
total (kinetic+potential) energy bounded and monotone wavefront — matching
the reference's implicit example behavior (collapse_dry_implicit.jl)."""
import numpy as np

from sph_mountain_waves_tpu.models import collapse_dry_implicit as ci


def test_isph_short():
    cfg = ci.Config(dr=0.05, t_end=0.4, n_frames=8)
    out = ci.run(cfg)
    X, H, E = out["X"], out["H"], out["E"]
    assert np.all(np.diff(X) > -1e-6)
    assert X[-1] > 1.8
    assert H[-1] < H[0]
    # projection keeps energy from growing; small decay from viscosity/penalty
    assert np.max(E / E[0]) < 1.01
    assert E[-1] / E[0] > 0.9
    assert int(out["state"].n) == out["system"].n


def test_isph_pressure_positive_definite_solve():
    # the solved pressure field should be finite and bounded
    cfg = ci.Config(dr=0.06, t_end=0.1, n_frames=2)
    out = ci.run(cfg)
    P = np.asarray(out["state"].fields["P"])[np.asarray(out["state"].active)]
    assert np.isfinite(P).all()
    rho_g_H = cfg.rho * abs(cfg.g) * cfg.water_column_height
    assert np.abs(P).max() < 20 * rho_g_H
