"""Hydrostatic tank regression — the simplest full loop.

Rebuild of sph_jl/examples/static_container.jl: square lattice, hydrostatic
init, direct density integration inside the mass balance (ρ += dt·…, :103),
and fluid-only pressure+viscous forces. Water should remain (nearly) static.

Citations: constants :28-44, struct :52-66, geometry :79-96,
interactions :101-116, loop :131-153.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import BoundaryLayer, Rectangle
from ..grids import Grid
from ..kernels import rDwendland2
from ..ops.apply import apply_binary, apply_unary
from ..structs import ParticleState, ParticleSystem, generate_particles
from .common import frame_runner, masked_max

FLUID = 0.0
WALL = 1.0


@dataclasses.dataclass(frozen=True)
class Config:
    dr: float = 2.0e-3
    rho0: float = 1000.0
    c: float = 40.0
    g: float = -9.81
    mu: float = 8.4e-4
    water_depth: float = 0.14
    box_height: float = 0.18
    box_width: float = 0.14
    t_end: float = 0.5
    n_frames: int = 50
    dtype: str = "float64"

    @property
    def h(self) -> float:
        return 2.4 * self.dr

    @property
    def m(self) -> float:
        return self.rho0 * self.dr**2

    @property
    def dt(self) -> float:
        return 0.2 * self.h / self.c

    @property
    def jdtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32


def make_system(cfg: Config) -> ParticleSystem:
    grid = Grid(cfg.dr, "square")
    box = Rectangle(0.0, 0.0, cfg.box_width, cfg.box_height)
    fluid = Rectangle(0.0, 0.0, cfg.box_width, cfg.water_depth)
    walls = BoundaryLayer(box, grid, 2.5 * cfg.dr)
    sys = ParticleSystem(
        fields={"x": 2, "v": 2, "a": 2, "rho": 0, "type": 0},
        domain=box + walls, h=cfg.h, dim=2, dtype=cfg.jdtype,
        defaults={"rho": cfg.rho0})
    generate_particles(sys, grid, fluid, lambda xs: {"type": FLUID})
    generate_particles(sys, grid, walls, lambda xs: {"type": WALL})
    for chunk in sys._chunks:  # hydrostatic init (:89-92)
        P = cfg.rho0 * cfg.g * (chunk["x"][:, 1] - cfg.water_depth)
        chunk["rho"] = cfg.rho0 + P / cfg.c**2
    return sys


def make_step(cfg: Config, engine):
    dt, m, c, rho0, h = cfg.dt, cfg.m, cfg.c, cfg.rho0, cfg.h

    def pressure(rho):
        return c**2 * (rho - rho0)

    def balance_of_mass(p, q, r):
        return {"rho": dt * jnp.sum((p.x - q.x) * (p.v - q.v), axis=-1)
                * m * rDwendland2(h, r)}  # direct integration (:101-103)

    def internal_force(p, q, r):
        ker = m * rDwendland2(h, r)
        fluid = p.type == FLUID
        a = (-(ker * (pressure(p.rho) / p.rho**2
                      + pressure(q.rho) / q.rho**2))[..., None] * (p.x - q.x)
             + (ker * 2 * cfg.mu / (p.rho * q.rho))[..., None] * (p.v - q.v))
        return {"a": jnp.where(fluid[..., None], a, 0.0)}

    def move(u):
        return {"x": u.x + 0.5 * dt * u.v, "a": jnp.zeros_like(u.a)}

    def accelerate(u):
        fluid = (u.type == FLUID)[:, None]
        gvec = jnp.zeros_like(u.v).at[:, 1].set(cfg.g)
        return {"v": jnp.where(fluid, u.v + 0.5 * dt * (u.a + gvec), u.v)}

    def step(state: ParticleState) -> ParticleState:
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)
        state = apply_binary(engine, state, nbrs, balance_of_mass)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)
        state = apply_binary(engine, state, nbrs, internal_force)
        state = apply_unary(state, accelerate)
        return state

    def init(state):
        state, nbrs = engine.rebuild(state)
        return apply_binary(engine, state, nbrs, internal_force)

    return step, init


def run(cfg: Config = Config(), out_path: str | None = None,
        verbose: bool = False):
    from ..io import new_pvd_file, save_frame, save_pvd_file

    sys = make_system(cfg)
    state = sys.freeze()
    step, init = make_step(cfg, sys.engine)
    state = jax.jit(init)(state)
    n_steps = int(round(cfg.t_end / cfg.dt))
    steps_per_frame = max(1, int(round(cfg.t_end / cfg.n_frames / cfg.dt)))
    run_frame = frame_runner(step, steps_per_frame)
    out = new_pvd_file(out_path) if out_path else None
    u_maxs = []
    k = 0
    while k < n_steps:
        state = run_frame(state)
        k += steps_per_frame
        v = jnp.sqrt(jnp.sum(state.fields["v"] ** 2, axis=-1))
        u_maxs.append(float(masked_max(v, state.active)))
        if verbose:
            print(f"t = {k * cfg.dt:.4f}  u_max = {u_maxs[-1]:.4e}")
        if out:
            save_frame(out, state, "rho", "type", "v", time=k * cfg.dt)
    if out:
        save_pvd_file(out)
    sys.state = state
    return {"u_max": np.asarray(u_maxs), "state": state, "system": sys}
