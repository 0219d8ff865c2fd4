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

__all__ = ["moment_matrix", "correction_vector", "corrected_sum",
           "corrected_laplacian", "NB"]

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


def laplacian_vector(engine, state: ParticleState, nbrs,
                     self_interaction: bool = True,
                     include_q=None, ridge: float = 0.0,
                     vol_of=None) -> jnp.ndarray:
    """β_L = M_p^{-1}·F_L with F_L selecting ∇²: with the pair basis
    H(dx = x_p − x_q), a quadratic T expands as T_q = T_p − dx·∇T +
    ½·H_quad·D²T…, so the reproduction conditions for Σ c_q·T_q = ∇²T|_p
    are Σc·H = [0, 0, 0, 2, 2, 0] (2-D; 3-D: 2 on the three squares).
    Exact for any quadratic field — INCLUDING one-sided neighborhoods at
    walls and free surfaces, which is where the plain Brookshaw/Cleary
    operator loses consistency. ``include_q`` (optional [N] bool): restrict
    the neighborhood (moment matrix AND the sum — both must see the same
    pairs or consistency breaks), e.g. to exclude adiabatic wall rows.
    ``vol_of``: q-view → particle volume (default q.m/q.rho; states
    without a per-particle mass field pass e.g. lambda q: m0/q.rho)."""
    d = engine.dim
    nb = NB[d]
    w = _wfun(d)
    if vol_of is None:
        vol_of = lambda q: q.m / jnp.maximum(q.rho, 1e-30)
    # states without a per-particle h field (e.g. Rayleigh-Bénard) use the
    # engine's uniform smoothing length
    hs = state.fields.get("h")
    h_of = (lambda p: p.h) if hs is not None else (lambda p: engine.h)
    if include_q is not None:
        st = ParticleState(fields={**state.fields,
                                   "_rk_inc": include_q.astype(state.fields["x"].dtype)},
                           active=state.active)
    else:
        st = state

    # h-SCALED basis H~ = H(dx/h): the raw-offset moment matrix mixes
    # scales 1..h⁴ and its 6x6 solve loses ~1% in f32 — fatal when the
    # result is divided by h² (a Laplacian amplifies basis error by 1/h²).
    # Scaling makes M O(1); the reproduction targets rescale to 2/h².
    def func(p, q, r):
        ph = h_of(p)
        dxs = [(p.x[..., a] - q.x[..., a]) / ph for a in range(d)]
        H = _basis(dxs)
        wt = vol_of(q) * w(ph, r)
        if include_q is not None:
            wt = wt * q._rk_inc
        HH = H[..., :, None] * H[..., None, :]
        return (HH * wt[..., None, None]).reshape(HH.shape[:-2] + (nb * nb,))

    M = pair_sum(engine, st, nbrs, func,
                 self_interaction=self_interaction).reshape(-1, nb, nb)
    eye = jnp.eye(nb, dtype=M.dtype)
    degenerate = M[:, 0, 0] < 1e-30
    M = jnp.where(degenerate[:, None, None], eye, M)
    ridge = ridge or 1e-7
    tr = jnp.trace(M, axis1=-2, axis2=-1)
    M = M + (ridge * tr / nb)[:, None, None] * eye
    h2 = (jnp.asarray(hs, M.dtype) ** 2 if hs is not None
          else jnp.asarray(engine.h, M.dtype) ** 2)
    F = jnp.zeros((M.shape[0], nb), dtype=M.dtype)
    sq = (3, 4) if d == 2 else (4, 5, 6)
    for k in sq:
        F = F.at[:, k].set(2.0 / h2)
    return jnp.linalg.solve(M, F[..., None]).squeeze(-1)


def corrected_laplacian(engine, state: ParticleState, nbrs,
                        values: jnp.ndarray,
                        beta_L: jnp.ndarray | None = None,
                        include_q=None,
                        self_interaction: bool = True,
                        vol_of=None) -> jnp.ndarray:
    """∇²values|_p = Σ_q (m_q/ρ_q)·values_q·(β_L·H_pq)·W(p.h, r) — the
    RKPM quadratic-consistent Laplacian (``laplacian_vector``). Exact for
    quadratic fields everywhere, boundaries included; the cure candidate
    for the Rayleigh-Bénard thermal-boundary-layer deficit (VERDICT r3)."""
    d = engine.dim
    w = _wfun(d)
    if vol_of is None:
        vol_of = lambda q: q.m / jnp.maximum(q.rho, 1e-30)
    if beta_L is None:
        beta_L = laplacian_vector(engine, state, nbrs, self_interaction,
                                  include_q=include_q, vol_of=vol_of)
    fields = {**state.fields, "_rk_beta": beta_L,
              "_rk_val": jnp.asarray(values, beta_L.dtype)}
    if include_q is not None:
        fields["_rk_inc"] = include_q.astype(beta_L.dtype)
    st = ParticleState(fields=fields, active=state.active)

    hs = state.fields.get("h")
    h_of = (lambda p: p.h) if hs is not None else (lambda p: engine.h)

    def func(p, q, r):
        # same h-scaled basis as laplacian_vector (β_L lives in H~ space)
        ph = h_of(p)
        dxs = [(p.x[..., a] - q.x[..., a]) / ph for a in range(d)]
        H = _basis(dxs)
        corr = jnp.sum(p._rk_beta * H, axis=-1)
        wt = vol_of(q) * w(ph, r)
        if include_q is not None:
            wt = wt * q._rk_inc
        return q._rk_val * wt * corr

    return pair_sum(engine, st, nbrs, func, self_interaction=self_interaction)
