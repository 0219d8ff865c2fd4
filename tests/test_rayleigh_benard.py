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


def test_rayleigh_benard_checkpoint_resume(tmp_path):
    """cfg-driven exact restart (SURVEY §5) on the thermal-convection
    model: resumed KE/Nu match the uninterrupted run bitwise."""
    base = dict(n_rows=24, t_end=0.2, n_frames=4, dtype="float64")
    full = rb.run(rb.Config(**base))

    p1 = tmp_path / "p1"
    rb.run(rb.Config(**{**base, "t_end": 0.1, "n_frames": 2,
                        "checkpoint_every": 2}), out_path=str(p1))
    res = rb.run(rb.Config(**base, resume=str(p1 / "checkpoint.npz")))
    assert len(res["KE"]) < len(full["KE"])
    assert res["t"][-1] == full["t"][-1]
    assert res["KE"][-1] == full["KE"][-1]
    assert res["Nu"][-1] == full["Nu"][-1]
