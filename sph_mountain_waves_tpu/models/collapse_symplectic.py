"""Bit-reversible dam break (fixed-point symplectic integration).

Rebuild of sph_jl/examples/collapse_symplectic.jl: position/velocity updates
through the reversible fixed-point ``rev_add`` (:133-143), Lennard-Jones wall
repulsion instead of SPH walls (:119-122), summation density against a
per-particle rho0 (:98-112), Boltzmann-entropy-of-velocity-histogram
diagnostic (:216-236), and time reversal: invert velocities at t_end and
replay backward to recover the initial state (:238-257).

Citations: constants :36-65, struct :67-76, geometry :81-92,
interactions :98-123, rev_add updates :133-143, LJ potential/energy
:145-164, verlet :170-180, main :194-257.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import BoundaryLayer, Rectangle
from ..grids import Grid
from ..kernels import rDwendland2, wendland2
from ..ops.apply import apply_binary, apply_unary
from ..structs import ParticleState, ParticleSystem, generate_particles
from ..utils.fixpa import rev_add
from .common import frame_runner, masked_sum

FLUID = 0.0
WALL = 1.0


@dataclasses.dataclass(frozen=True)
class Config:
    dr: float = 1.0e-2
    rho0: float = 1000.0
    g: float = -9.8
    mu: float = 0.0
    water_column_width: float = 1.0
    water_column_height: float = 2.0
    box_height: float = 3.0
    box_width: float = 4.0
    c: float = 50.0
    eps: float = 1e-16
    t_end: float = 1.0
    n_frames: int = 100
    dtype: str = "float64"   # fixed-point reversibility needs f64

    @property
    def h(self) -> float:
        return 3.0 * self.dr

    @property
    def m(self) -> float:
        return self.rho0 * self.dr**2

    @property
    def wall_width(self) -> float:
        return 2.5 * self.dr

    @property
    def dr_wall(self) -> float:
        return 0.95 * self.dr

    @property
    def E_wall(self) -> float:
        return 10 * abs(self.g) * self.water_column_height

    @property
    def dt(self) -> float:
        return 0.1 * self.h / self.c

    @property
    def jdtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32


def make_system(cfg: Config) -> ParticleSystem:
    grid = Grid(cfg.dr, "square")
    box = Rectangle(0.0, 0.0, cfg.box_width, cfg.box_height)
    fluid = Rectangle(0.0, 0.0, cfg.water_column_width, cfg.water_column_height)
    walls = BoundaryLayer(box, grid, cfg.wall_width)
    domain = Rectangle(-cfg.box_width, -cfg.box_width, 2 * cfg.box_width,
                       3 * cfg.box_height)  # (:87)
    sys = ParticleSystem(
        fields={"x": 2, "v": 2, "a": 2, "P": 0, "rho": 0, "rho0": 0, "type": 0},
        domain=domain, h=cfg.h, dim=2, dtype=cfg.jdtype)
    generate_particles(sys, grid, fluid, lambda xs: {"type": FLUID})
    generate_particles(sys, grid, walls, lambda xs: {"type": WALL})
    return sys


def make_step(cfg: Config, engine):
    dt, m, c, h = cfg.dt, cfg.m, cfg.c, cfg.h

    def both_fluid(p, q):
        return (p.type == FLUID) & (q.type == FLUID)

    def find_rho(p, q, r):
        return {"rho": jnp.where(both_fluid(p, q), m * wendland2(h, r), 0.0)}

    def find_rho0(p, q, r):
        return {"rho0": jnp.where(both_fluid(p, q), m * wendland2(h, r), 0.0)}

    def find_pressure(u):
        return {"P": c**2 * (u.rho - u.rho0)}

    def internal_force(p, q, r):
        ker = m * rDwendland2(h, r)
        x_pq = p.x - q.x
        a_ff = -(ker * (p.P / jnp.maximum(p.rho, 1e-12) ** 2
                        + q.P / jnp.maximum(q.rho, 1e-12) ** 2))[..., None] * x_pq
        # LJ wall repulsion (:119-122)
        s = cfg.dr_wall / (r + cfg.eps)
        lj = (-cfg.E_wall / (r + cfg.eps) ** 2 * (s**2 - s**4))[..., None] * x_pq
        fw = (p.type == FLUID) & (q.type == WALL) & (r < cfg.dr_wall)
        out = jnp.where(both_fluid(p, q)[..., None], a_ff, 0.0)
        return {"a": out + jnp.where(fw[..., None], lj, 0.0)}

    def reset(u):
        return {"a": jnp.zeros_like(u.a), "rho": jnp.zeros_like(u.rho)}

    def move(u):
        fluid = (u.type == FLUID)[:, None]
        return {"x": jnp.where(fluid, rev_add(u.x, dt * u.v), u.x)}

    def accelerate(u):
        fluid = (u.type == FLUID)[:, None]
        gvec = jnp.zeros_like(u.v).at[:, 1].set(cfg.g)
        return {"v": jnp.where(fluid, rev_add(u.v, 0.5 * dt * (u.a + gvec)),
                               u.v)}

    def step(state: ParticleState) -> ParticleState:
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)
        state = apply_unary(state, reset)
        state = apply_binary(engine, state, nbrs, find_rho,
                             self_interaction=True)
        state = apply_unary(state, find_pressure)
        state = apply_binary(engine, state, nbrs, internal_force)
        state = apply_unary(state, accelerate)
        return state

    def init(state):
        state, nbrs = engine.rebuild(state)
        state = apply_binary(engine, state, nbrs, find_rho0,
                             self_interaction=True, add=False)
        state = apply_binary(engine, state, nbrs, find_rho,
                             self_interaction=True, add=False)
        state = apply_unary(state, find_pressure)
        state = apply_binary(engine, state, nbrs, internal_force)
        return state

    return step, init


def invert_velocities(state: ParticleState) -> ParticleState:
    return state.replace(v=-state.fields["v"])


def kinetic_energy(cfg: Config, state: ParticleState) -> float:
    v2 = jnp.sum(state.fields["v"] ** 2, axis=-1)
    return float(masked_sum(0.5 * cfg.m * v2, state.active))


def run(cfg: Config = Config(), revert: bool = True, n_entropy: int = 20,
        verbose: bool = False):
    """Forward run + optional time-reversed replay (main, :194-257).
    Returns entropy time series and the position-recovery error."""
    from ..utils.entropy import entropy_2D_MB, velocity_histogram

    sys = make_system(cfg)
    state = sys.freeze()
    step, init = make_step(cfg, sys.engine)
    state = jax.jit(init)(state)

    x0 = np.asarray(state.fields["x"]).copy()
    n_steps = int(round(cfg.t_end / cfg.dt))
    chunk = max(1, n_steps // n_entropy)
    run_chunk = frame_runner(step, chunk)

    Ss, Ekin = [], []
    done = 0
    while done < n_steps:
        state = run_chunk(state)
        done += chunk
        Ss.append(entropy_2D_MB(velocity_histogram(state, N=100)))
        Ekin.append(kinetic_energy(cfg, state))
        if verbose:
            print(f"forward t = {done * cfg.dt:.3f}  S = {Ss[-1]:.4f}")

    out = {"S_forward": np.asarray(Ss), "Ekin": np.asarray(Ekin)}
    if revert:
        state = invert_velocities(state)
        Ss_rev = []
        done = 0
        while done < n_steps:
            state = run_chunk(state)
            done += chunk
            Ss_rev.append(entropy_2D_MB(velocity_histogram(
                state, v_max=float(np.sqrt(2 * abs(cfg.g)
                                           * cfg.water_column_height)), N=100)))
            if verbose:
                print(f"backward t = {done * cfg.dt:.3f}  S = {Ss_rev[-1]:.4f}")
        # recovery error vs the initial configuration; rows are permuted by
        # the cell sorts, so match as point sets (nearest neighbour)
        xf = np.asarray(state.fields["x"])[np.asarray(state.active)]
        xi = x0[: len(xf)]
        err = 0.0
        for i in range(0, len(xi), 256):
            d = np.linalg.norm(xi[i:i + 256, None, :] - xf[None, :, :], axis=-1)
            err = max(err, float(d.min(axis=1).max()))
        out["recovery_error"] = err
        out["S_backward"] = np.asarray(Ss_rev)
    out["state"] = state
    out["system"] = sys
    sys.state = state
    return out
