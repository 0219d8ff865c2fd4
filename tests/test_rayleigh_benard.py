"""Rayleigh-Bénard convection gates (BASELINE.json config #2): a seeded
perturbation must GROW into convection (KE up orders of magnitude, Nusselt
proxy > 1) above the critical Rayleigh number and DECAY to pure conduction
(Nu = 1) below it — the classic onset discrimination."""
import numpy as np

from sph_mountain_waves_tpu.models import rayleigh_benard as rb


def test_convection_onset_discrimination():
    sup = rb.run(rb.Config(n_rows=20, Ra=1e6, t_end=8.0, n_frames=8))
    sub = rb.run(rb.Config(n_rows=20, Ra=300.0, t_end=8.0, n_frames=8))

    # supercritical: seeded roll grows into convection
    assert sup["KE"][-1] > 0.3
    assert sup["KE"][-1] > 30 * sup["KE"][2]
    assert sup["Nu"][-1] > 1.3

    # subcritical: conduction state, no sustained motion
    assert sub["KE"][-1] < 1e-3
    assert abs(sub["Nu"][-1] - 1.0) < 0.02
    assert np.all(np.isfinite(sub["KE"])) and np.all(np.isfinite(sup["KE"]))

    # particle budget intact in both
    assert int(sup["state"].n) == sup["system"].n_built
    assert int(sub["state"].n) == sub["system"].n_built


def test_config_dimensionless_control():
    # Ra and Pr uniquely set nu and kappa
    cfg = rb.Config(Ra=1e5, Pr=2.0)
    Ra_back = cfg.g * cfg.beta * cfg.dT * cfg.H**3 / (cfg.nu * cfg.kappa)
    assert abs(Ra_back / cfg.Ra - 1) < 1e-12
    assert abs(cfg.nu / cfg.kappa - cfg.Pr) < 1e-12
