"""3-D droplet with surface tension.

Rebuild of sph_jl/examples/drop.jl: color-gradient normals
n = Σ 2V²∇W·x_pq with soft normalization (:76-87), surface-tension force
using the second kernel derivative DDwendland3 (:101-112), summation density
against a per-particle reference rho0, and a tensile-energy audit (:130-137).

Citations: constants :19-45, struct :47-56, geometry :61-70,
interactions :76-112, energy :130-137, verlet :143-155, main :166-191.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..geometry import Ball, Box
from ..grids import Grid
from ..kernels import DDwendland3, rDwendland3, wendland3
from ..ops.apply import apply_binary, apply_unary
from ..structs import ParticleState, ParticleSystem, generate_particles
from .common import frame_runner, masked_sum

FLUID = 0.0
SOLID = 1.0


@dataclasses.dataclass(frozen=True)
class Config:
    dr: float = 3.7e-5
    rad: float = 1e-3
    rho0: float = 1000.0
    mu: float = 0.1
    beta: float = 72e-3        # surface tension
    g: float = -9.8            # along z
    t_end: float = 2e-5
    n_frames: int = 50
    dtype: str = "float64"

    @property
    def h(self) -> float:
        return 3.0 * self.dr

    @property
    def m(self) -> float:
        return self.rho0 * self.dr**3

    @property
    def vol(self) -> float:
        return self.dr**3

    @property
    def c(self) -> float:
        return 10.0 * max(np.sqrt(self.beta / self.rho0 / self.dr),
                          np.sqrt(4 * abs(self.g) * self.rad))

    @property
    def dt(self) -> float:
        return 0.3 * self.dr / self.c

    @property
    def s0(self) -> float:
        return self.dr * self.dr / 100

    @property
    def deskw(self) -> float:
        return 0.9 * self.h

    @property
    def jdtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32


def make_system(cfg: Config) -> ParticleSystem:
    grid = Grid(cfg.dr, "cubic")
    r = cfg.rad
    drop_s = Ball(0.0, 0.0, r + cfg.h, r)
    desk = Box(-2 * r, -2 * r, -cfg.deskw, 2 * r, 2 * r, 0.0)
    dom = Box(-2 * r, -2 * r, -2 * cfg.deskw, 2 * r, 2 * r, 2.2 * r)
    sys = ParticleSystem(
        fields={"x": 3, "v": 3, "a": 3, "P": 0, "rho": 0, "rho0": 0,
                "n": 3, "type": 0},
        domain=dom, h=cfg.h, dim=3, dtype=cfg.jdtype)
    generate_particles(sys, grid, drop_s, lambda xs: {"type": FLUID})
    generate_particles(sys, grid, desk, lambda xs: {"type": SOLID})
    return sys


def make_step(cfg: Config, engine):
    dt, m, h, vol, s0 = cfg.dt, cfg.m, cfg.h, cfg.vol, cfg.s0
    c, rho0, mu, beta = cfg.c, cfg.rho0, cfg.mu, cfg.beta

    def find_n(p, q, r):
        return {"n": (2 * vol * vol * rDwendland3(h, r))[..., None] * (p.x - q.x)}

    def reset_n(u):
        return {"n": jnp.zeros_like(u.n)}

    def normalize_n(u):
        s = jnp.sqrt(jnp.sum(u.n**2, axis=-1))
        return {"n": u.n / (s + s0)[:, None]}

    def find_rho(p, q, r):
        return {"rho": q.P * 0 + m * wendland3(h, r)}

    def find_rho0(p, q, r):
        return {"rho0": q.P * 0 + m * wendland3(h, r)}

    def find_pressure(u):
        return {"P": c**2 * (u.rho - u.rho0)}

    def internal_force(p, q, r):
        ker = m * rDwendland3(h, r)
        x_pq = p.x - q.x
        a = -(ker * (p.P / rho0**2 + q.P / rho0**2))[..., None] * x_pq
        a = a + (2 * ker * mu / rho0**2)[..., None] * (p.v - q.v)
        # surface tension with DDwendland3 (:101-112)
        n_pq = p.n - q.n
        dotxn = jnp.sum(x_pq * n_pq, axis=-1)
        tens = ((m * DDwendland3(h, r) - ker) * dotxn / (r**2 + s0))[..., None] * x_pq
        tens = tens + ker[..., None] * n_pq
        return {"a": a - (2 * beta / rho0**2) * tens}

    def reset_a(u):
        return {"a": jnp.zeros_like(u.a)}

    def reset_rho(u):
        return {"rho": jnp.zeros_like(u.rho)}

    def move(u):
        fluid = (u.type == FLUID)[:, None]
        return {"x": jnp.where(fluid, u.x + dt * u.v, u.x)}

    def accelerate(u):
        fluid = (u.type == FLUID)[:, None]
        gvec = jnp.zeros_like(u.v).at[:, 2].set(cfg.g)
        return {"v": jnp.where(fluid, u.v + 0.5 * dt * (u.a + gvec), u.v)}

    def init(state):
        state, nbrs = engine.rebuild(state)
        state = apply_binary(engine, state, nbrs, find_rho0,
                             self_interaction=True, add=False)
        state = apply_binary(engine, state, nbrs, find_rho,
                             self_interaction=True, add=False)
        state = apply_unary(state, find_pressure)
        state = apply_binary(engine, state, nbrs, find_n)
        state = apply_unary(state, normalize_n)
        state = apply_binary(engine, state, nbrs, internal_force)
        return state

    def step(state: ParticleState) -> ParticleState:
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)
        state = apply_unary(state, reset_rho)
        state = apply_binary(engine, state, nbrs, find_rho, self_interaction=True)
        state = apply_unary(state, reset_n)
        state = apply_binary(engine, state, nbrs, find_n, self_interaction=True)
        state = apply_unary(state, normalize_n)
        state = apply_unary(state, find_pressure)
        state = apply_unary(state, reset_a)
        state = apply_binary(engine, state, nbrs, internal_force)
        state = apply_unary(state, accelerate)
        return state

    return step, init


def energy(cfg: Config, state: ParticleState):
    """kinetic + internal + tensile + potential audit (:130-137)."""
    f = state.fields
    kinetic = 0.5 * cfg.m * jnp.sum(f["v"] ** 2, axis=-1)
    internal = 0.5 * cfg.m * cfg.c**2 * (f["rho"] - f["rho0"]) ** 2 / cfg.rho0**2
    s = jnp.sqrt(jnp.sum(f["n"] ** 2, axis=-1))
    tensile = cfg.beta * (s - cfg.s0 * jnp.log(s / cfg.s0 + 1))
    potential = -cfg.m * cfg.g * f["x"][:, 2]
    return masked_sum(kinetic + internal + tensile + potential, state.active)


def run(cfg: Config = Config(), out_path: str | None = None,
        verbose: bool = False):
    import jax

    from ..io import new_pvd_file, save_frame, save_pvd_file

    sys = make_system(cfg)
    state = sys.freeze()
    step, init = make_step(cfg, sys.engine)
    state = jax.jit(init)(state)

    n_steps = int(round(cfg.t_end / cfg.dt))
    steps_per_frame = max(1, int(round(cfg.t_end / cfg.n_frames / cfg.dt)))
    run_frame = frame_runner(step, steps_per_frame)
    out = new_pvd_file(out_path) if out_path else None
    Es = [float(energy(cfg, state))]
    k = 0
    while k < n_steps:
        state = run_frame(state)
        k += steps_per_frame
        Es.append(float(energy(cfg, state)))
        if verbose:
            print(f"t = {k * cfg.dt:.3e}  dE = {Es[-1] - Es[0]:.3e}  "
                  f"n = {int(state.n)}")
        if out:
            save_frame(out, state, "v", "a", "P", "rho", "rho0", "type", "n",
                       time=k * cfg.dt)
    if out:
        save_pvd_file(out)
    sys.state = state
    return {"E": np.asarray(Es), "state": state, "system": sys}
