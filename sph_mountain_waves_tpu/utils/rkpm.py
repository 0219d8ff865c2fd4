"""RKPM kernel correction (reproducing-kernel particle method).

The reference carries an RKPM sketch as dead code (never called, and broken
as committed: src/legacy/isothermal_static_witch.jl:202-210 assembles the
moment matrix M from a SINGLE pair and solves M\\F per pair, which is
singular — the moment matrix must be summed over the whole neighborhood).
This is the working TPU-native equivalent: per-particle quadratic-basis
moment matrices assembled with one pair sweep, batched 6x6 solves (MXU
friendly), and a corrected-kernel pair sum

    W~(p, q) = (beta_p . H(x_p - x_q)) W(p.h, r),
    beta_p   = M_p^{-1} e_0,
    M_p      = sum_q (m_q/rho_q) H H^T W(p.h, r),

which reproduces polynomials up to degree 2 exactly — including at free
surfaces and walls where the plain kernel sum loses partition of unity.

Basis (2-D, quadratic): H = [1, dx, dy, dx^2, dy^2, dx dy] — the exact basis
of the reference sketch (:203).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..kernels import wendland2, wendland3
from ..ops.apply import pair_sum
from ..structs import ParticleState

__all__ = ["moment_matrix", "correction_vector", "corrected_sum", "NB"]

NB = {2: 6, 3: 10}  # quadratic basis size per dimension


def _basis(dx_axes):
    """Quadratic monomial basis of the pair offset: [..., NB[dim]]."""
    d = len(dx_axes)
    one = jnp.ones_like(dx_axes[0])
    if d == 2:
        dx, dy = dx_axes
        cols = [one, dx, dy, dx * dx, dy * dy, dx * dy]
    else:
        dx, dy, dz = dx_axes
        cols = [one, dx, dy, dz, dx * dx, dy * dy, dz * dz,
                dx * dy, dx * dz, dy * dz]
    return jnp.stack(cols, axis=-1)


def _wfun(dim):
    return wendland2 if dim == 2 else wendland3


def moment_matrix(engine, state: ParticleState, nbrs,
                  self_interaction: bool = True) -> jnp.ndarray:
    """Per-particle moment matrix M_p = Σ_q (m_q/ρ_q)·H H^T·W(p.h, r),
    [N, nb, nb] (the neighborhood-summed fix of the reference's per-pair
    assembly, isothermal_static_witch.jl:203-205)."""
    d = engine.dim
    nb = NB[d]
    w = _wfun(d)

    def func(p, q, r):
        dxs = [p.x[..., a] - q.x[..., a] for a in range(d)]
        H = _basis(dxs)                                   # [N, K, nb]
        wt = (q.m / jnp.maximum(q.rho, 1e-30)) * w(p.h, r)
        HH = H[..., :, None] * H[..., None, :]            # [N, K, nb, nb]
        return (HH * wt[..., None, None]).reshape(HH.shape[:-2] + (nb * nb,))

    M = pair_sum(engine, state, nbrs, func,
                 self_interaction=self_interaction)
    return M.reshape(M.shape[0], nb, nb)


def correction_vector(engine, state: ParticleState, nbrs,
                      self_interaction: bool = True,
                      ridge: float = 0.0) -> jnp.ndarray:
    """β_p = M_p^{-1} e_0, [N, nb] (reference :206-207, per-neighborhood).
    Inactive/isolated rows get the identity moment matrix (β = e_0, i.e. the
    uncorrected kernel) so the batched solve stays finite."""
    d = engine.dim
    nb = NB[d]
    M = moment_matrix(engine, state, nbrs, self_interaction)
    eye = jnp.eye(nb, dtype=M.dtype)
    # a particle with no neighbors has M ≈ 0 except possibly M[0,0]
    degenerate = M[:, 0, 0] < 1e-30
    M = jnp.where(degenerate[:, None, None], eye, M)
    # trace-relative ridge keeps rank-deficient neighborhoods (isolated or
    # collinear particles) finite; negligible against f32 roundoff otherwise
    ridge = ridge or 1e-7
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    M = M + (ridge * tr / nb)[:, None, None] * eye
    F = jnp.zeros((M.shape[0], nb), dtype=M.dtype).at[:, 0].set(1.0)
    return jnp.linalg.solve(M, F[..., None]).squeeze(-1)


def corrected_sum(engine, state: ParticleState, nbrs, values: jnp.ndarray,
                  beta: jnp.ndarray | None = None,
                  self_interaction: bool = True) -> jnp.ndarray:
    """Σ_q (m_q/ρ_q)·values_q·W~(p, q) with the RKPM-corrected kernel
    (reference :209 `corr = (β'*H)*wendland2(p.h,r)`). Reproduces any
    polynomial field of degree ≤ 2 exactly, boundaries included."""
    d = engine.dim
    w = _wfun(d)
    if beta is None:
        beta = correction_vector(engine, state, nbrs, self_interaction)
    st = ParticleState(
        fields={**state.fields, "_rk_beta": beta,
                "_rk_val": jnp.asarray(values, beta.dtype)},
        active=state.active)

    def func(p, q, r):
        dxs = [p.x[..., a] - q.x[..., a] for a in range(d)]
        H = _basis(dxs)                                   # [N, K, nb]
        corr = jnp.sum(p._rk_beta * H, axis=-1)           # [N, K]
        wt = (q.m / jnp.maximum(q.rho, 1e-30)) * w(p.h, r)
        return q._rk_val * wt * corr

    return pair_sum(engine, st, nbrs, func, self_interaction=self_interaction)
