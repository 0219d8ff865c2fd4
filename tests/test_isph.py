"""ISPH (incompressible projection) gates: the matrix-free preconditioned CG
pressure solve must keep the flow nearly incompressible — total
(kinetic+potential) energy bounded and monotone wavefront — matching the
reference's implicit example behavior (collapse_dry_implicit.jl). Also gates
the ISPH mountain-wave variant (BASELINE.json config #4)."""
import pytest
import jax
import jax.numpy as jnp
import numpy as np

from sph_mountain_waves_tpu.models import collapse_dry_implicit as ci


@pytest.mark.smoke
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


def test_isph_witch_static_and_projection():
    """ISPH mountain-wave (BASELINE config #4): the static stratified
    atmosphere stays static under the projection scheme, and a random
    velocity kick is projected toward a divergence-free, decaying flow."""
    from sph_mountain_waves_tpu.models import isph_witch as iw
    from sph_mountain_waves_tpu.ops.apply import apply_binary
    from sph_mountain_waves_tpu.kernels import rDspline23

    cfg = iw.ISPHWitchConfig(n_rows=12, dtype="float64", t_end=12.0,
                             n_frames=5)
    out = iw.run(cfg)
    assert out["u_max"][-1] < 1e-6  # static atmosphere stays static

    sys = iw.make_system(cfg)
    state = sys.freeze()
    eng = sys.engine
    step = jax.jit(iw.make_step(cfg, eng))
    rng = np.random.default_rng(0)
    f = state.fields
    state = state.replace(v=jnp.where(
        (f["type"] == 0.0)[:, None],
        jnp.asarray(0.5 * rng.standard_normal(f["v"].shape)), f["v"]))

    def divf(p, q, r):
        return {"div": -jnp.sum((p.x - q.x) * (p.v - q.v), axis=-1)
                * p.rho_bg * cfg.dr**2 * rDspline23(cfg.h0, r)}

    def metrics(st):
        st2, nbrs = eng.rebuild(st)
        st2 = st2.replace(div=jnp.zeros_like(st2.fields["div"]))
        st2 = apply_binary(eng, st2, nbrs, divf)
        d = st2.fields["div"]
        ke = float(jnp.sum(jnp.where(
            st2.active, jnp.sum(st2.fields["v"]**2, -1), 0.0)))
        return (float(jnp.sqrt(jnp.mean(jnp.where(st2.active, d, 0.0)**2))),
                ke)

    d0, ke0 = metrics(state)
    for _ in range(10):
        state = step(state)
    d10, ke10 = metrics(state)
    assert np.isfinite(d10) and np.isfinite(ke10)
    assert d10 < 0.3 * d0        # divergence projected away
    assert ke10 < 0.2 * ke0      # kick decays (projection + sponge)
    assert int(state.n) == sys.n_built


def test_isph_witch_checkpoint_resume(tmp_path):
    """cfg-driven exact restart (SURVEY §5) on the ISPH projection loop:
    resumed diagnostics match the uninterrupted run bitwise."""
    from sph_mountain_waves_tpu.models import isph_witch as iw

    # v_char=260 -> dt_isph=1.5 s, so t_end=8 is 5 steps / 4+ frames and
    # t_end=4 is 3 steps — the checkpointed run leaves real steps for the
    # resume to replay (at the default v_char=50, dt=7.8 s makes every run
    # a single step and resume a no-op)
    base = dict(n_rows=12, dtype="float64", t_end=8.0, n_frames=4,
                v_char=260.0)
    full = iw.run(iw.ISPHWitchConfig(**base))

    p1 = tmp_path / "p1"
    iw.run(iw.ISPHWitchConfig(**{**base, "t_end": 4.0, "n_frames": 2,
                                 "checkpoint_every": 2}), out_path=str(p1))
    res = iw.run(iw.ISPHWitchConfig(**base,
                                    resume=str(p1 / "checkpoint.npz")))
    assert len(res["u_max"]) < len(full["u_max"])
    assert res["t"][-1] == full["t"][-1]
    assert res["u_avg"][-1] == full["u_avg"][-1]
    assert res["u_max"][-1] == full["u_max"][-1]
