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
    GridVcycle, _stencil_apply, coarse_stencil_2d, coarse_stencil_3d)
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


def test_coarse_stencil_3d_matches_dense_galerkin():
    """27-tap 3-D Galerkin coarse stencil (round 5) vs the dense Pᵀ A P
    on a random 3-D bucket cloud — the 3-D analogue of the 2-D gate."""
    from sph_mountain_waves_tpu import Box, ParticleSystem

    rng = np.random.default_rng(7)
    n, box_hi, h = 220, 1.0, 0.26
    x = rng.uniform(0, box_hi, size=(n, 3))
    dom = Box(0.0, 0.0, 0.0, box_hi, box_hi, box_hi)
    sys = ParticleSystem(fields={"x": 3, "m": 0}, domain=dom, h=h, dim=3,
                         dtype=jnp.float64)
    sys.add_particles(x, {"m": np.ones(n)})
    state = sys.freeze(layout="bucket")
    eng = sys.engine
    assert eng.dim == 3
    state, nbrs = eng.rebuild(state)
    w = lambda r: 2.0 * h**2 * rDspline23(h, r)
    diag = jnp.where(state.active,
                     jnp.asarray(rng.standard_normal(state.capacity)), 0.0)

    W = np.asarray(coarse_stencil_3d(eng, state, w, diag))

    # brute-force Pᵀ A P straight from particle pairs (the dense A at 3-D
    # slot counts — cap·(128·ny·nz+1) — would be tens of GB)
    act = np.asarray(state.active)
    _, _, key = eng._screen_and_key(state)
    key = np.asarray(key)
    C = eng.num_cells
    rows = np.where(act & (key < C))[0]
    xs = np.asarray(state.fields["x"])
    dg = np.asarray(diag)
    from collections import defaultdict
    Ac = defaultdict(float)
    for i in rows:
        Ac[(key[i], key[i])] += dg[i]
        for j in rows:
            if j == i:
                continue
            r = np.linalg.norm(xs[i] - xs[j])
            if r <= h:
                Ac[(key[i], key[j])] += float(w(r))
    nx, ny, nz = eng.lims
    # only cells with any occupancy couple — checking every tap of every
    # cell is 27·C python iterations; restrict to occupied cells' rows
    occ_cells = np.unique(key[rows])
    checked = 0
    for dk in (-1, 0, 1):
        for dj in (-1, 0, 1):
            for di in (-1, 0, 1):
                tap = W[1 + dk, 1 + dj, 1 + di].reshape(-1)
                for c in occ_cells:
                    iz, rem = divmod(int(c), ny * nx)
                    iy, ix = divmod(rem, nx)
                    jx, jy, jz = ix + di, iy + dj, iz + dk
                    want = 0.0
                    if 0 <= jx < nx and 0 <= jy < ny and 0 <= jz < nz:
                        want = Ac.get((int(c), (jz * ny + jy) * nx + jx),
                                      0.0)
                    assert abs(tap[c] - want) < 1e-9, (di, dj, dk, c)
                    checked += 1
    assert checked >= 27 * len(occ_cells) and len(occ_cells) > 30


def test_vcycle_3d_symmetric_positive_definite():
    """The n-D V-cycle on a 3-D 7-point SPD model stencil is symmetric,
    positive definite, and spectrally close to A⁻¹."""
    nz, ny, nx = 6, 8, 10
    W = np.zeros((3, 3, 3, nz, ny, nx))
    W[1, 1, 1] = 6.5
    for tap in ((1, 1, 0), (1, 1, 2), (1, 0, 1), (1, 2, 1),
                (0, 1, 1), (2, 1, 1)):
        W[tap] = -1.0
    vc = GridVcycle(jnp.asarray(W))
    n = nz * ny * nx
    M = np.zeros((n, n))
    A = np.zeros((n, n))
    for i in range(n):
        e = np.zeros(n)
        e[i] = 1.0
        g = jnp.asarray(e.reshape(nz, ny, nx))
        M[:, i] = np.asarray(vc.apply(g)).ravel()
        A[:, i] = np.asarray(_stencil_apply(jnp.asarray(W), g)).ravel()
    assert np.abs(M - M.T).max() < 1e-10
    evals = np.linalg.eigvalsh(0.5 * (M + M.T))
    assert evals.min() > 0
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
