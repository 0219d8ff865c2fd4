"""ICR — implicit consistency renormalization.

Rebuild of sph_jl/examples/utils/ICR.jl: a density-restoring particle shift
that solves a 3N×3N saddle-point system (identity / gradient / divergence
blocks, :16-47) for displacements driving the kernel-summation density to
the uniform target 1/dr², Newton-style (:59-82).

The reference file is stale — it calls ``SPHLib.sum`` (the package's
pre-rename name, :23-24,54) and is broken as committed; this is the working
equivalent. Dense solve — intended for small systems (initial-condition
preparation), like the reference's direct ``A\\b``.
"""
from __future__ import annotations

import numpy as np

from ..kernels import rDwendland2, wendland2
from ..ops.apply import pair_sum
from ..structs import ParticleState

__all__ = ["renormalize"]


def _pairs(x, h):
    d = x[:, None, :] - x[None, :, :]
    r = np.linalg.norm(d, axis=-1)
    mask = r <= h
    return d, r, mask


def renormalize(engine, state: ParticleState, dr: float, tol: float = 1e-6,
                max_steps: int = 10, jitter: float = 0.3, seed: int = 0,
                verbose: bool = False, return_info: bool = False):
    """Shift active particles so Σ w(h, r) → 1/dr² (2-D). Host-side dense
    Newton iteration (reference renormalize!, :59-82). Returns the state with
    updated positions (and, with return_info, the residual history).

    Note: satisfying the uniform-density target pushes edge particles
    slightly outside the original shape, exactly as the reference shifts do.
    """
    import jax.numpy as jnp

    h = engine.h
    rho0 = 1.0 / dr**2
    act = np.asarray(state.active)
    x = np.asarray(state.fields["x"]).copy()
    rng = np.random.default_rng(seed)
    x[act] += jitter * dr * (rng.random(x[act].shape) - 1.0)  # (:64-66)
    idx = np.where(act)[0]
    N = len(idx)

    errs = []
    for it in range(max_steps + 1):
        xa = x[idx]
        d, r, mask = _pairs(xa, h)
        W = np.array(wendland2(h, np.where(mask, r, 2 * h)))
        W[~mask] = 0.0
        b = np.zeros(3 * N)
        b[2 * N:] = W.sum(axis=1) - rho0  # rhs (:49-57)
        err = np.abs(b).max()
        errs.append(err)
        if verbose:
            print(f"ICR iter {it}: err = {err:.3e}")
        if err < tol or it == max_steps:
            break

        rD = np.array(rDwendland2(h, np.where(mask, r, 2 * h)))
        rD[~mask] = 0.0
        grad = rD[:, :, None] * d  # [N, N, 2] — ∇W contributions
        S = -2.0 * grad.sum(axis=1)  # row sums (:23-25)

        A = np.zeros((3 * N, 3 * N))
        A[:N, :N] = np.eye(N)
        A[N:2 * N, N:2 * N] = np.eye(N)
        # UR block = Grad − ½δ·S ; DL block = Div (+½δ·S) (:36-44)
        A[:N, 2 * N:] = grad[:, :, 0] - 0.5 * np.diag(S[:, 0])
        A[N:2 * N, 2 * N:] = grad[:, :, 1] - 0.5 * np.diag(S[:, 1])
        A[2 * N:, :N] = grad[:, :, 0] + 0.5 * np.diag(S[:, 0])
        A[2 * N:, N:2 * N] = grad[:, :, 1] + 0.5 * np.diag(S[:, 1])

        y, *_ = np.linalg.lstsq(A, b, rcond=None)
        x[idx, 0] += y[:N]
        x[idx, 1] += y[N:2 * N]

    new_state = state.replace(x=jnp.asarray(x, state.fields["x"].dtype))
    if return_info:
        return new_state, {"errs": errs}
    return new_state
