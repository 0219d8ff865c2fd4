"""FixPA — reversible (fixed-point) arithmetic.

Rebuild of sph_jl/examples/utils/FixPA.jl: addition on a fixed-point lattice
with ε = 2⁻³⁰, the mechanism behind the bit-reversible time integration in
collapse_symplectic.jl. ``rev_add(x, y) = ε·(round(x/ε) + round(y/ε))`` is an
exactly invertible update: ``rev_add(rev_add(x, y), -y) == x`` bitwise
(as long as values stay within the exactly-representable integer range of
the float dtype — use float64).

Works elementwise on arrays (vectors included), jit-safe.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["FIXPA_EPS", "nom", "rev_add"]

FIXPA_EPS = 1.0 / 2**30  # FixPA.jl:11


def nom(x):
    """Fixed-point value of x (FixPA.jl:18-20). Stays in float (exact for
    |x/ε| < 2^53 in float64)."""
    return jnp.round(x / FIXPA_EPS)


def rev_add(x, y):
    """Reversible addition (FixPA.jl:27-42), elementwise on any shape."""
    return FIXPA_EPS * (nom(x) + nom(y))
