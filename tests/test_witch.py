"""Mountain-wave (wcsph_perturbed_witch) gates.

The reference's default static-atmosphere configuration sums density without
the kernel self-term (apply!(compute_density!) with self=false,
src/current/wcsph_perturbed_witch.jl:317), which under the adaptive-h update
h = η√(m/ρ) converges to the fixed point ρ/ρ_bg → 1/(1+η⁻²·7/π·(4/3)...)
≈ 0.593. We regression-lock that faithful behavior, and check that the
self-inclusive option keeps the atmosphere far closer to static.
"""
import jax
import numpy as np
import pytest

from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.witch_common import (
    FLUID, WitchConfig, background_density, witch_profile,
)


def run_steps(cfg, n):
    sys = w.make_system(cfg)
    state = sys.freeze()
    step = jax.jit(w.make_step(cfg, sys.engine))
    for _ in range(n):
        state = step(state)
    return sys, state


def fluid_mask(state):
    return np.asarray(state.active) & (np.asarray(state.fields["type"]) == FLUID)


def test_reference_faithful_density_fixed_point():
    cfg = WitchConfig(n_rows=24, dtype="float64")
    sys, state = run_steps(cfg, 10)
    act = fluid_mask(state)
    f = state.fields
    rho = np.asarray(f["rho"])[act]
    rho_bg = background_density(cfg, np.asarray(f["x"])[act][:, 1])
    # interior fixed point ~0.593 (boundary rows deviate)
    assert np.median(rho / rho_bg) == pytest.approx(0.593, abs=0.02)
    assert np.median(np.asarray(f["h"])[act]) / cfg.dr == pytest.approx(2.34, abs=0.05)
    # state stays finite, count conserved
    assert np.isfinite(np.asarray(f["v"])[act]).all()
    assert int(state.n) == sys.n_built


@pytest.mark.smoke
def test_self_density_is_much_more_static():
    n_steps = 16
    u_max = {}
    for flag in (False, True):
        cfg = WitchConfig(n_rows=30, dtype="float32", self_density=flag)
        sys, state = run_steps(cfg, n_steps)
        act = fluid_mask(state)
        v = np.asarray(state.fields["v"])[act]
        u_max[flag] = float(np.max(np.linalg.norm(v, axis=1)))
    assert u_max[True] < 0.5 * u_max[False]
    assert u_max[True] < 1.0  # m/s — far below c ≈ 255 m/s


def test_witch_profile_and_mountain_generation():
    # enabling the mountain adds FLUID particles below the profile
    cfg = WitchConfig(n_rows=30, h_m=2000.0, a=8000.0)
    sys = w.make_system(cfg)
    host = sys.host_fields()
    below = host["x"][:, 1] <= witch_profile(cfg, host["x"][:, 0])
    assert below.sum() > 0
    # profile value at x = a is h_m/2 (Witch of Agnesi)
    assert witch_profile(cfg, cfg.a) == pytest.approx(cfg.h_m / 2)


def test_run_loop_diagnostics():
    cfg = WitchConfig(n_rows=16, t_end=0.8, n_frames=2, dtype="float32")
    out = w.run(cfg)
    assert len(out["u_avg"]) >= 2
    assert np.isfinite(out["u_avg"]).all() and np.isfinite(out["u_max"]).all()
    assert (out["u_max"] >= out["u_avg"]).all()


def test_lazy_diagnostics_identical():
    """lazy_diagnostics skips the per-step T/θ unaries; after the per-frame
    finalize, every field must be bitwise identical to the eager run."""
    import jax
    import jax.numpy as jnp

    states = {}
    for lazy in (False, True):
        cfg = WitchConfig(n_rows=12, dtype="float32", self_density=True,
                          layout="bucket", skin=0.2, lazy_diagnostics=lazy)
        sys = w.make_system(cfg)
        st = sys.freeze()
        step = jax.jit(w.make_step(cfg, sys.engine))
        for _ in range(8):
            st = step(st)
        if lazy:
            st = jax.jit(w.make_finalize(cfg))(st)
        states[lazy] = st
    for f in ("x", "v", "rho", "P", "T", "theta", "T_p", "theta_p"):
        a = np.asarray(states[False].fields[f])
        b = np.asarray(states[True].fields[f])
        assert np.array_equal(a, b), f


def test_checkpoint_resume_bitwise(tmp_path):
    """cfg-driven exact checkpoint/resume in the shared run loop (SURVEY §5):
    a run checkpointed mid-way and resumed from <out>/checkpoint.npz must
    reproduce the uninterrupted trajectory BITWISE — the checkpoint restores
    every slot-shaped field incl. _xref, so the same jitted program replays
    the identical float sequence."""
    base = dict(n_rows=16, t_end=0.8, n_frames=2, dtype="float32",
                self_density=True, layout="bucket", skin=0.2)
    full = w.run(WitchConfig(**base))

    p1 = tmp_path / "part1"
    w.run(WitchConfig(**{**base, "t_end": 0.4, "n_frames": 1,
                         "checkpoint_every": 1}),
          out_path=str(p1))
    ckpt = str(p1 / "checkpoint.npz")
    # resume into the SAME output directory: artifacts must continue, not
    # restart — frame numbering appends, result.pvd lists both segments,
    # data.csv merges the pre-resume history
    res = w.run(WitchConfig(**base, resume=ckpt), out_path=str(p1))
    # resumed run covers only the remaining frames, ending on the same step
    assert len(res["u_max"]) < len(full["u_max"])
    assert res["t"][-1] == full["t"][-1]
    assert res["u_avg"][-1] == full["u_avg"][-1]
    assert res["u_max"][-1] == full["u_max"][-1]

    import xml.etree.ElementTree as ET

    from sph_mountain_waves_tpu import read_vtp
    from sph_mountain_waves_tpu.io import read_csv
    times = [float(el.attrib["timestep"]) for el in
             ET.parse(p1 / "result.pvd").getroot().iter("DataSet")]
    assert times == sorted(times) and times[0] == 0.0  # both segments listed
    assert times[-1] == res["t"][-1]
    frames = sorted(int(f.stem[5:]) for f in p1.glob("frame*.vtp"))
    assert frames == list(range(len(times)))  # appended, no overwrite gaps
    pts0, _ = read_vtp(str(p1 / "frame0.vtp"))  # t=0 frame survives resume
    assert len(pts0) > 0
    data = read_csv(str(p1 / "data.csv"))  # merged history spans the run
    np.testing.assert_allclose(data["u_max"][-len(res["u_max"]):],
                               res["u_max"], rtol=1e-6)
    assert data["t"][0] < res["t"][0]
