"""Gates for the two-level / multigrid ISPH preconditioner (ops/mg.py).

1. The Galerkin coarse stencil equals the dense Pᵀ A P for piecewise-
   constant-per-cell aggregation (machine precision, f64).
2. The V-cycle is a symmetric positive-definite linear operator.
3. On the kicked ISPH witch, the two-level preconditioner cuts CG
   iterations at least 2x vs Jacobi — the round-4 ISPH solver lever
   (reference context: the ILU hint commented out in
   sph_jl/examples/collapse_dry_implicit.jl:222-231; Jacobi was the
   round-3 production preconditioner, 73 its at the 208k baseline).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sph_mountain_waves_tpu.kernels import rDspline23
from sph_mountain_waves_tpu.models import isph_witch as iw
from sph_mountain_waves_tpu.ops.mg import (
    GridVcycle, _stencil_apply, coarse_stencil_2d)
from sph_mountain_waves_tpu.ops.solvers import assemble_matrix


def _kicked_system(n_rows=10, **kw):
    cfg = iw.ISPHWitchConfig(n_rows=n_rows, dtype="float64", layout="bucket",
                             lattice_cells=True, skin=0.15, **kw)
    sys = iw.make_system(cfg)
    state = sys.freeze()
    rng = np.random.default_rng(3)
    f = state.fields
    state = state.replace(v=jnp.where(
        (f["type"] == 0.0)[:, None],
        jnp.asarray(0.5 * rng.standard_normal(f["v"].shape)), f["v"]))
    return cfg, sys, state


@pytest.mark.smoke
def test_coarse_stencil_matches_dense_galerkin():
    # ~90 s single-core (measured round 5) — fits the smoke tier's
    # <15-min budget; not `heavy` (that mark means several minutes and
    # contradicts smoke, advisor round-4 finding)
    cfg, sys, state = _kicked_system(n_rows=8)
    eng = sys.engine
    state, nbrs = eng.rebuild(state)
    h = cfg.h0
    vol = cfg.dr**2
    w = lambda r: 2.0 * h**2 * vol * rDspline23(h, r)
    rng = np.random.default_rng(0)
    diag = jnp.where(state.active,
                     jnp.asarray(rng.standard_normal(state.capacity)), 0.0)

    W = np.asarray(coarse_stencil_2d(eng, state, w, diag))

    # dense A on the same operator (assemble_matrix always includes the
    # i==j term — remove it: the coarse stencil keeps self in `diag` only)
    A = np.asarray(assemble_matrix(eng, state, nbrs,
                                   lambda p, q, r: w(r)))
    act_f = np.asarray(state.active, dtype=float)
    A = A - np.diag(float(w(jnp.zeros(()))) * act_f)
    A = A + np.diag(np.asarray(diag))
    act = np.asarray(state.active)
    A = A * np.outer(act, act)
    # PWC aggregation matrix from the engine's own binning
    _, _, key = eng._screen_and_key(state)
    key = np.asarray(key)
    C = eng.num_cells
    P = np.zeros((state.capacity, C))
    rows = np.where(act & (key < C))[0]
    P[rows, key[rows]] = 1.0
    Ac = P.T @ A @ P
    nx, ny = eng.lims
    for dj in (-1, 0, 1):
        for di in (-1, 0, 1):
            tap = W[1 + dj, 1 + di].reshape(-1)
            for c in range(C):
                iy, ix = divmod(c, nx)
                jy, jx = iy + dj, ix + di
                want = 0.0
                if 0 <= jx < nx and 0 <= jy < ny:
                    want = Ac[c, jy * nx + jx]
                assert abs(tap[c] - want) < 1e-9, (di, dj, c)


@pytest.mark.smoke
def test_vcycle_symmetric_positive_definite():
    # SPD model stencil: 5-point Laplacian + mass term on a 12x20 grid
    ny, nx = 12, 20
    W = np.zeros((3, 3, ny, nx))
    W[1, 1] = 4.4
    W[1, 0] = W[1, 2] = W[0, 1] = W[2, 1] = -1.0
    vc = GridVcycle(jnp.asarray(W))
    rng = np.random.default_rng(1)
    n = ny * nx
    M = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        M[:, i] = np.asarray(vc.apply(jnp.asarray(e.reshape(ny, nx)))).ravel()
    assert np.abs(M - M.T).max() < 1e-10      # symmetric
    evals = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert evals.min() > 0                    # positive definite
    # and actually useful: M ~ A^-1 (spectral equivalence within a factor)
    A = np.zeros((n, n))
    u = np.zeros((ny, nx))
    for i in range(n):
        u.ravel()[...] = 0.0
        u.reshape(-1)[i] = 1.0
        A[:, i] = np.asarray(_stencil_apply(jnp.asarray(W),
                                            jnp.asarray(u))).ravel()
    cond = np.linalg.eigvalsh(M @ A)
    assert cond.real.max() / cond.real.min() < 12.0


def test_two_level_cuts_cg_iterations():
    its = {}
    for precond in ("jacobi", "mg"):
        cfg, sys, state = _kicked_system(n_rows=10, cg_tol=1e-6,
                                         cg_maxiter=400, precond=precond)
        step = jax.jit(iw.make_step(cfg, sys.engine))
        s = step(state)
        s = step(s)
        its[precond] = int(s.fields["cg_it"][0])
        assert float(s.fields["cg_res"][0]) < 1e-6 * 10
    assert its["mg"] <= its["jacobi"] // 2, its
