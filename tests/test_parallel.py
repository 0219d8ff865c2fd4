"""Multi-chip domain-decomposition gates on the 8-device virtual CPU mesh:
sharded runs must match single-device physics, conserve particles across
migration, and the 3-D stretch configuration must compile and step."""
import jax
import numpy as np
import pytest

from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models import collapse3d as c3
from sph_mountain_waves_tpu.models.witch_common import (
    WitchConfig, velocity_diagnostics,
)
from sph_mountain_waves_tpu.parallel.domain import make_mesh, shard_state
from sph_mountain_waves_tpu.parallel.run import (
    build_domain_sharding, make_sharded_runner, run_sharded_witch,
)


def test_sharded_witch_matches_single_device():
    cfg = WitchConfig(n_rows=14, dtype="float64", self_density=True)
    sys = w.make_system(cfg)
    state = sys.freeze()
    step = jax.jit(w.make_step(cfg, sys.engine))
    for _ in range(10):
        state = step(state)
    u_avg1, u_max1 = (float(v) for v in velocity_diagnostics(state))

    out = run_sharded_witch(cfg, n_dev=8, n_frames=1, steps_per_frame=10)
    assert out["n"][-1] == sys.n_built  # migration conserves particles
    assert out["u_avg"][-1] == pytest.approx(u_avg1, rel=1e-12)
    assert out["u_max"][-1] == pytest.approx(u_max1, rel=1e-12)


def test_sharded_3d_stretch_config():
    # 3-D mountain-wave-scale stretch: dam-break physics in 3-D, slab-sharded
    # over 8 devices (BASELINE.json stretch config at reduced size)
    cfg = c3.Config(dr=0.02, dtype="float64")
    sys = c3.make_system(cfg)
    sys.freeze()
    mesh = make_mesh(8)
    ds = build_domain_sharding(sys, 8)
    state = shard_state(ds, sys.state, mesh)
    run_frame, diag = make_sharded_runner(
        ds, mesh, lambda eng: c3.make_step(cfg, eng), steps_per_frame=3)
    state = run_frame(state)
    u_avg, u_max, n = diag(state)
    assert int(n) == sys.n_built
    assert np.isfinite(float(u_avg)) and np.isfinite(float(u_max))


def test_migration_across_slabs():
    # particles given a strong x-velocity must migrate between devices
    # without loss
    import jax.numpy as jnp
    from sph_mountain_waves_tpu import Rectangle, ParticleSystem
    from sph_mountain_waves_tpu.ops.apply import apply_unary

    dom = Rectangle(0.0, 0.0, 8.0, 1.0)
    sys = ParticleSystem(fields={"x": 2, "v": 2}, domain=dom, h=0.25, dim=2,
                         dtype=jnp.float64)
    rng = np.random.default_rng(3)
    xs = np.stack([rng.uniform(1.2, 6.8, size=500),
                   rng.uniform(0.05, 0.95, size=500)], axis=-1)
    vs = np.stack([rng.uniform(-1.0, 1.0, size=500),
                   np.zeros(500)], axis=-1)  # x-drift only: stay in-domain
    sys.add_particles(xs, {"v": vs})
    sys.freeze()
    mesh = make_mesh(8)
    ds = build_domain_sharding(sys, 8)
    state = shard_state(ds, sys.state, mesh)

    def make_step(engine):
        def step(state):
            state = apply_unary(state, lambda u: {"x": u.x + 0.05 * u.v})
            state, _ = engine.rebuild(state)
            return state
        return step

    run_frame, diag = make_sharded_runner(ds, mesh, make_step,
                                          steps_per_frame=5)
    for _ in range(4):  # 20 steps: each particle moves up to 1.0 in x
        state = run_frame(state)
    _, _, n = diag(state)
    assert int(n) == 500  # every migrant arrived somewhere
