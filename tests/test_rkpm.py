"""RKPM kernel-correction gates: the corrected kernel must reproduce
polynomials up to degree 2 exactly — including at boundaries where the
plain kernel sum loses partition of unity (the working equivalent of the
reference's dead-code sketch, src/legacy/isothermal_static_witch.jl:202-210)."""
import jax
import numpy as np
import pytest

from sph_mountain_waves_tpu import Rectangle, ParticleSystem
from sph_mountain_waves_tpu.utils import rkpm


def make_lattice(dr=0.1, h=0.25):
    dom = Rectangle(0.0, 0.0, 1.0, 1.0)
    sys = ParticleSystem(fields={"x": 2, "m": 0, "rho": 0, "h": 0},
                         domain=dom, h=h, dim=2,
                         defaults={"m": dr * dr, "rho": 1.0, "h": h})
    xs = np.stack(np.meshgrid(np.arange(dr / 2, 1.0, dr),
                              np.arange(dr / 2, 1.0, dr)), -1).reshape(-1, 2)
    sys.add_particles(xs, {})
    state = sys.freeze()
    state, nbrs = sys.engine.rebuild(state)
    return sys, state, nbrs


@pytest.mark.smoke
def test_plain_kernel_sum_loses_unity_at_boundary():
    sys, state, nbrs = make_lattice()
    ones = np.ones(state.capacity)
    s = np.asarray(rkpm.corrected_sum(
        sys.engine, state, nbrs, ones,
        beta=np.zeros((state.capacity, 6)) + np.eye(6)[0]))
    act = np.asarray(state.active)
    assert s[act].min() < 0.8  # corners: truncated support


def test_rkpm_partition_of_unity():
    sys, state, nbrs = make_lattice()
    ones = np.ones(state.capacity)
    s = np.asarray(rkpm.corrected_sum(sys.engine, state, nbrs, ones))
    act = np.asarray(state.active)
    np.testing.assert_allclose(s[act], 1.0, atol=1e-5)


def test_rkpm_reproduces_quadratics():
    sys, state, nbrs = make_lattice()
    x = np.asarray(state.fields["x"])
    f = 3.0 + 2.0 * x[:, 0] - 1.5 * x[:, 1] \
        + 4.0 * x[:, 0] ** 2 + 0.5 * x[:, 1] ** 2 - 2.0 * x[:, 0] * x[:, 1]
    beta = rkpm.correction_vector(sys.engine, state, nbrs)
    s = np.asarray(rkpm.corrected_sum(sys.engine, state, nbrs, f, beta=beta))
    act = np.asarray(state.active)
    np.testing.assert_allclose(s[act], f[act], rtol=1e-4, atol=1e-5)


def test_rkpm_isolated_particle_is_finite():
    # a particle with no neighbors must fall back to the uncorrected kernel
    sys, state, nbrs = make_lattice(dr=0.4, h=0.3)  # spacing > h: no pairs
    beta = np.asarray(rkpm.correction_vector(sys.engine, state, nbrs))
    assert np.isfinite(beta).all()


def test_rkpm_laplacian_exact_on_quadratics_at_boundary():
    """The quadratic-consistent Laplacian reads ∇²f exactly everywhere —
    including edge/corner rows with one-sided neighborhoods, where the
    Brookshaw/Cleary form is inconsistent (the RB thermal-BC deficit)."""
    sys, state, nbrs = make_lattice()
    x = np.asarray(state.fields["x"])
    f = 3.0 + 2.0 * x[:, 0] - 1.5 * x[:, 1] \
        + 4.0 * x[:, 0] ** 2 + 0.5 * x[:, 1] ** 2 - 2.0 * x[:, 0] * x[:, 1]
    lap = np.asarray(rkpm.corrected_laplacian(sys.engine, state, nbrs, f))
    act = np.asarray(state.active)
    np.testing.assert_allclose(lap[act], 2 * 4.0 + 2 * 0.5,
                               rtol=2e-3, atol=1e-4)


def test_rkpm_laplacian_restricted_neighborhood():
    """``include_q`` restricts BOTH the moment matrix and the sum: with the
    right half of the lattice excluded, left-half particles still read the
    exact Laplacian from their one-sided neighborhoods."""
    sys, state, nbrs = make_lattice()
    x = np.asarray(state.fields["x"])
    f = 1.0 + x[:, 0] ** 2 + 2.0 * x[:, 1] ** 2
    import jax.numpy as jnp
    inc = jnp.asarray(x[:, 0] < 0.5) & state.active
    lap = np.asarray(rkpm.corrected_laplacian(sys.engine, state, nbrs, f,
                                              include_q=inc))
    sel = np.asarray(state.active) & (x[:, 0] < 0.5)
    np.testing.assert_allclose(lap[sel], 6.0, rtol=2e-3, atol=1e-4)
