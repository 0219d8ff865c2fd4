"""Gates for the remaining canonical examples: 3-D collapse, droplet surface
tension, hydrostatic container, elastic rod, bit-reversible dam break, and
the entropy/FixPA utilities."""
import numpy as np
import pytest

from sph_mountain_waves_tpu.models import (
    collapse3d as c3,
    collapse_symplectic as cs,
    drop as dp,
    rod,
    static_container as sc,
)
from sph_mountain_waves_tpu.utils.entropy import (
    entropy_2D_MB, fit_maxwell_boltzmann, velocity_histogram,
)
from sph_mountain_waves_tpu.utils.fixpa import FIXPA_EPS, rev_add


@pytest.mark.heavy
def test_collapse3d_energy():
    out = c3.run(c3.Config(dr=0.015, t_end=0.06, n_frames=3))
    E = out["E"]
    assert np.isfinite(E).all()
    assert np.max(np.abs(E / E[0] - 1.0)) < 0.02
    assert int(out["state"].n) == out["system"].n_built


def test_drop_energy_budget():
    out = dp.run(dp.Config(dr=1.2e-4, t_end=6e-6, n_frames=3))
    E = out["E"]
    assert np.isfinite(E).all()
    assert abs(E[-1] / E[0] - 1.0) < 0.05  # tensile+kinetic+internal audit


def test_static_container_stays_static():
    out = sc.run(sc.Config(dr=5e-3, t_end=0.2, n_frames=4))
    assert np.max(out["u_max"]) < 0.2  # m/s — spurious currents stay small


@pytest.mark.heavy
def test_rod_energy_conservation_after_pull():
    cfg = rod.Config(n_width=8, t_end=2.0, n_plot=40)
    out = rod.run(cfg)
    t, E = out["t"], out["E"]
    after = t > cfg.pull_time + 0.1
    Ea = E[after]
    # the eta correction keeps post-load energy flat (reference :148-152)
    assert (Ea.max() - Ea.min()) / abs(Ea.mean()) < 0.01
    # the rod tip deflects upward and oscillates
    amp = out["amplitude"][after]
    assert amp.max() > cfg.W * 0.9


@pytest.mark.smoke
def test_symplectic_reversibility():
    # invert velocities and replay: initial positions recovered to the
    # fixed-point lattice (reference collapse_symplectic.jl:238-257)
    cfg = cs.Config(dr=0.04, t_end=0.05)
    out = cs.run(cfg, revert=True, n_entropy=2)
    assert out["recovery_error"] < 100 * FIXPA_EPS
    assert int(out["state"].n) == out["system"].n_built


def test_fixpa_exact_inverse():
    x = np.array([0.123456, -2.5, 7.0])
    y = np.array([1e-3, 0.77, -3.3])
    z = np.asarray(rev_add(rev_add(x, y), -np.asarray(y)))
    x_lat = FIXPA_EPS * np.round(x / FIXPA_EPS)
    np.testing.assert_array_equal(z, x_lat)


def test_entropy_histogram_and_mb_fit():
    rng = np.random.default_rng(0)
    m = 1.0e-3
    beta_true = 2.0
    # sample 2D MB speeds by sampling 2D gaussian velocities
    sigma = 1.0 / np.sqrt(m * beta_true)
    v = rng.normal(0, sigma, size=(20000, 2))
    hist = velocity_histogram(v, N=100)
    beta, T = fit_maxwell_boltzmann(hist, m)
    assert beta == pytest.approx(beta_true, rel=0.1)
    S = entropy_2D_MB(hist)
    assert np.isfinite(S)
    # entropy of a colder (lower beta -> broader) distribution is larger
    v2 = rng.normal(0, 2 * sigma, size=(20000, 2))
    S2 = entropy_2D_MB(velocity_histogram(v2, N=100))
    assert S2 > S


def test_checkpoint_bitwise_resume(tmp_path):
    import jax
    from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
    from sph_mountain_waves_tpu.models.witch_common import WitchConfig
    from sph_mountain_waves_tpu.utils.checkpoint import (
        engine_from_meta, load_checkpoint, save_checkpoint,
    )

    cfg = WitchConfig(n_rows=12, dtype="float32", self_density=True,
                      layout="bucket", skin=0.2)
    sys = w.make_system(cfg)
    state = sys.freeze()
    step = jax.jit(w.make_step(cfg, sys.engine))
    for _ in range(5):
        state = step(state)
    path = str(tmp_path / "ckpt")
    save_checkpoint(path, state, sys.engine, extra={"step": 5})

    # continue 3 more steps from live state
    ref = state
    for _ in range(3):
        ref = step(ref)

    # resume from checkpoint: bit-identical continuation
    state2, meta = load_checkpoint(path)
    assert meta["extra"]["step"] == 5
    eng2 = engine_from_meta(meta)
    step2 = jax.jit(w.make_step(cfg, eng2))
    for _ in range(3):
        state2 = step2(state2)
    for name in ref.fields:
        np.testing.assert_array_equal(np.asarray(ref.fields[name]),
                                      np.asarray(state2.fields[name]), err_msg=name)


def test_checkpoint_format_cross_rejection(tmp_path):
    """The two checkpoint formats share the npz container but have
    incompatible semantics (full slot-shaped state vs compacted owned
    rows); each loader must reject the other's file with a clear error
    instead of loading inactive zero rows as particles."""
    import jax
    import pytest
    from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
    from sph_mountain_waves_tpu.models.witch_common import WitchConfig
    from sph_mountain_waves_tpu.parallel.bucket import load_checkpoint_bucket
    from sph_mountain_waves_tpu.utils.checkpoint import (
        load_checkpoint, save_checkpoint,
    )

    cfg = WitchConfig(n_rows=12, dtype="float32", self_density=True,
                      layout="bucket", skin=0.2)
    sys = w.make_system(cfg)
    state = sys.freeze()
    slots_path = str(tmp_path / "slots.npz")
    save_checkpoint(slots_path, state, sys.engine, extra={"step": 1})
    with pytest.raises(ValueError, match="slots"):
        load_checkpoint_bucket(slots_path)

    # sharded save of the same run -> rejected by the slot loader
    from jax.sharding import Mesh
    from sph_mountain_waves_tpu.parallel.bucket import (
        build_bucket_sharding, save_checkpoint_bucket, shard_state_bucket,
    )
    mesh = Mesh(np.array(jax.devices()[:8]), ("x",))
    bds = build_bucket_sharding(sys, 8)
    st = shard_state_bucket(bds, sys, mesh)
    rows_path = str(tmp_path / "rows.npz")
    save_checkpoint_bucket(rows_path, bds, st, extra={"step": 0})
    with pytest.raises(ValueError, match="rows"):
        load_checkpoint(rows_path)
