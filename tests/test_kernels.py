"""Kernel unit tests — property-based checks matching the reference suite
(sph_jl/tests/test_kernels.jl): compact support, finiteness at 0, unit
normalization by Simpson quadrature with dimension-appropriate measure,
∫Df = Δf consistency, and rDf(r) ≈ Df(r)/r."""
import jax.numpy as jnp
import numpy as np
import pytest

from sph_mountain_waves_tpu import kernels as K

TOL = 0.01
N = 1000


def simpson(f, a, b, n=N):
    # same composite rule as sph_jl/tests/test_kernels.jl:9-18, vectorized
    h = (b - a) / n
    _a = a + np.arange(1, n) * h
    _b = _a + h
    vals = h / 6.0 * (f(_a) + 4.0 * f(0.5 * (_a + _b)) + f(_b))
    return float(np.sum(np.asarray(vals)))


CASES = [
    (1, K.wendland1, K.Dwendland1, K.rDwendland1),
    (2, K.wendland2, K.Dwendland2, K.rDwendland2),
    (3, K.wendland3, K.Dwendland3, K.rDwendland3),
    (2, K.spline23, K.Dspline23, K.rDspline23),
    (2, K.spline24, K.Dspline24, K.rDspline24),
]


@pytest.mark.parametrize("dim,f,Df,rDf", CASES, ids=[c[1].__name__ for c in CASES])
def test_local_kernel(dim, f, Df, rDf):
    h = 0.42
    # compact support and finiteness (test_kernels.jl:21-22)
    assert float(f(h, 4.0)) == 0.0
    assert np.isfinite(float(f(h, 0.0)))

    if dim == 1:
        integral = simpson(lambda r: 2.0 * np.asarray(f(h, r)), 0.0, h)
    elif dim == 2:
        integral = simpson(lambda r: 2.0 * np.pi * r * np.asarray(f(h, r)), 0.0, h)
    else:
        integral = simpson(lambda r: 4.0 * np.pi * r * r * np.asarray(f(h, r)), 0.0, h)
    assert integral == pytest.approx(1.0, rel=TOL)

    assert float(Df(h, 4.0)) == 0.0
    assert np.isfinite(float(Df(h, 0.0)))
    integral = simpson(lambda r: np.asarray(Df(h, r)), 0.2, 0.3)
    diff = float(f(h, 0.3)) - float(f(h, 0.2))
    assert integral == pytest.approx(diff, rel=0.01)

    assert float(rDf(h, 4.0)) == 0.0
    assert np.isfinite(float(rDf(h, 0.0)))
    assert float(rDf(h, 0.1)) == pytest.approx(float(Df(h, 0.1)) / 0.1, rel=TOL)


def test_ddwendland3_is_radial_second_derivative():
    # DDwendland3 (src/kernels.jl:197-204) must match d(Dwendland3)/dr
    h = 0.42
    eps = 1e-6
    for r in [0.05, 0.1, 0.2, 0.3, 0.4]:
        fd = (float(K.Dwendland3(h, r + eps)) - float(K.Dwendland3(h, r - eps))) / (2 * eps)
        assert float(K.DDwendland3(h, r)) == pytest.approx(fd, rel=1e-4)


def test_kernels_vectorize_and_accept_array_h():
    # the engine calls kernels on [N, K] pair blocks with per-pair h
    r = jnp.linspace(0.0, 1.0, 64).reshape(8, 8)
    h = jnp.full((8, 8), 0.7)
    for fn in [K.wendland2, K.rDwendland2, K.spline23, K.rDspline23, K.spline24,
               K.rDspline24, K.wendland3, K.DDwendland3]:
        out = fn(h, r)
        assert out.shape == (8, 8)
        assert bool(jnp.all(jnp.isfinite(out)))
    # zero beyond support even with mixed h
    h2 = jnp.array([0.1, 0.5])
    assert np.allclose(np.asarray(K.wendland2(h2, jnp.array([0.2, 0.2])))[0], 0.0)
