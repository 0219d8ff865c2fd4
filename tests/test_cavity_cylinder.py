"""Gates for the lid-driven cavity (probes vs Ghia) and the DFG cylinder
(inflow recycling, drag measurement)."""
import os

import numpy as np
import pytest

from sph_mountain_waves_tpu.models import cavity_flow as cf
from sph_mountain_waves_tpu.models import cylinder as cy

DATA = os.path.join(os.path.dirname(__file__), "reference_data")


def test_cavity_short():
    cfg = cf.Config(N=40, Re=100.0, t_end=0.15, n_frames=10)
    out = cf.run(cfg)
    s, v1, v2 = out["s"], out["v1"], out["v2"]
    assert np.isfinite(v1).all() and np.isfinite(v2).all()
    # lid drags the top fluid in +x
    assert v1[-2] > 0.05
    # circulation: near-wall bottom flow opposes the lid (or is ~0 early)
    assert v1[1] < 0.05
    # probes bounded by lid speed
    assert np.abs(v1).max() <= 1.05 and np.abs(v2).max() <= 1.05


@pytest.mark.slow
def test_cavity_vs_ghia_re100():
    # measured (r2): mean_err 0.062 at N=75 settled to t_end=3.0 (was 0.094
    # at N=50/1.5); gate with ~30% margin
    cfg = cf.Config(N=75, Re=100.0, t_end=3.0, n_frames=10)
    out = cf.run(cfg)
    ref = np.genfromtxt(os.path.join(DATA, "ldc-y2vx.csv"), delimiter=",",
                        names=True)
    ours = np.interp(ref["y"], out["s"], out["v1"])
    err = np.abs(ours - ref["Re100"])
    assert err.mean() < 0.08


def test_cylinder_inflow_recycling():
    cfg = cy.Config(n_around=12, t_end=0.8, n_frames=4, dtype="float64")
    out = cy.run(cfg)
    n = out["n"]
    built = out["system"].n_built
    # inflow creates particles; outflow removal keeps the count bounded
    assert n[-1] > built * 0.98
    assert n.max() < built * 1.25
    assert np.isfinite(out["C_SPH"]).all()


@pytest.mark.smoke
def test_cylinder_geometry_types():
    cfg = cy.Config(n_around=12)
    sys = cy.make_system(cfg)
    types = sys.host_fields()["type"]
    for t in (cy.FLUID, cy.INFLOW, cy.WALL, cy.OBSTACLE):
        assert (types == t).sum() > 0
    # obstacle particles inside the cylinder
    host = sys.host_fields()
    obs = host["x"][types == cy.OBSTACLE]
    rr = np.linalg.norm(obs - [cfg.cyl1, cfg.cyl2], axis=1)
    assert rr.max() <= cfg.cyl_r + 1e-9


@pytest.mark.slow
def test_cavity_vs_ghia_re400():
    """Second Ghia Reynolds point (the reference ships Re 100/400/1000
    columns, sph_jl/examples/reference/ldc-y2vx.csv; comparison code
    cavity_flow.jl:182-220). Re=400 has thinner boundary layers than
    Re=100 (mean_err 0.062 at the same N) — calibrated round 4 at two
    resolutions: mean_err 0.139 at N=75/t_end=6 and 0.122 at
    N=100/t_end=8 (convergent; max_err 0.26–0.29 at the near-wall jet
    peaks at both N). Round 5 moves the gate to the finer point with a
    ~30% margin so it demonstrates the converged accuracy, not the
    coarse one."""
    cfg = cf.Config(N=100, Re=400.0, t_end=8.0, n_frames=10)
    out = cf.run(cfg)
    ref = np.genfromtxt(os.path.join(DATA, "ldc-y2vx.csv"), delimiter=",",
                        names=True)
    ours = np.interp(ref["y"], out["s"], out["v1"])
    err = np.abs(ours - ref["Re400"])
    assert err.mean() < 0.16


@pytest.mark.slow
def test_cavity_vs_ghia_re1000():
    """Third (hardest) Ghia Reynolds point — the reference ships Re
    100/400/1000 columns (sph_jl/examples/reference/ldc-y2vx.csv,
    comparison cavity_flow.jl:182-220). Thinnest boundary layers of the
    three; calibrated round 5: mean_err 0.183 at N=100/t_end=10 (f64 and
    f32 agree to 0.002; max_err 0.377 at the near-wall jet peaks —
    same error structure as Re=400). Gate with ~30% margin. The error
    trend across the three columns (0.062 / 0.122 / 0.183 at matched or
    finer N) is the expected SPH thin-BL degradation, convergent in N at
    each Re."""
    cfg = cf.Config(N=100, Re=1000.0, t_end=10.0, n_frames=10)
    out = cf.run(cfg)
    ref = np.genfromtxt(os.path.join(DATA, "ldc-y2vx.csv"), delimiter=",",
                        names=True)
    ours = np.interp(ref["y"], out["s"], out["v1"])
    err = np.abs(ours - ref["Re1000"])
    assert err.mean() < 0.24


@pytest.mark.slow
def test_cylinder_drag_coefficient():
    """Quantitative DFG drag gate (the reference computes the relative
    error against C_ref = 5.57953523384 at runtime, cylinder.jl:176,
    203-216, but never asserts): steady-state C_D at n_around=20 within
    the measured accuracy envelope (calibrated round 4: C_D ≈ 6.3 at this
    resolution — ~13% high and plateaued from t ≈ 4; gate at 20%). Lift
    is O(1e-2) and sign-/resolution-sensitive at this dr — bounded
    loosely. t_end = 5 keeps the gate hours cheaper than the full DFG
    t_end = 40; the drag average runs over t ∈ [2.5, 5] where the
    calibration run already sat at its plateau."""
    cfg = cy.Config(n_around=20, t_end=5.0, n_frames=5, dtype="float64")
    out = cy.run(cfg)
    C_D, C_L = out["C_SPH"]
    assert abs(C_D / 5.57953523384 - 1.0) < 0.20, C_D
    assert abs(C_L) < 0.6


@pytest.mark.slow
def test_cylinder_drag_coefficient_convergent():
    """Resolution step on the DFG drag (round 5): C_D falls toward the
    published 5.5795 as the cylinder is refined — measured 6.27 (13%
    high) at n_around=20 and **5.92 (6.2% high) at n_around=28**
    (t_end=5, drag averaged over the t ∈ [2.5, 5] plateau; ~2.8 h
    single-core). Gate the finer point at 10%."""
    cfg = cy.Config(n_around=28, t_end=5.0, n_frames=5, dtype="float64")
    out = cy.run(cfg)
    C_D, C_L = out["C_SPH"]
    assert abs(C_D / 5.57953523384 - 1.0) < 0.10, C_D
    assert abs(C_L) < 0.5
