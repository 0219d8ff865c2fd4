"""Lid-driven cavity (Re 100–400–1000) — CFD benchmark vs Ghia et al.

Rebuild of sph_jl/examples/cavity_flow.jl: WCSPH with background pressure P0
against tensile instability (:38), lid Dirichlet BC by linear velocity
extrapolation inside the pair force (:106-111), Monaghan
angular-momentum-conserving viscosity (:113), and steady-state SPH
interpolation probes along the centerlines with Shepard normalization
(compute_fluxes, :162-180) validated against the Ghia reference columns
(reference/ldc-{x2vy,y2vx}.csv).

Citations: constants :28-52, geometry :71-86, interactions :92-114,
verlet loop :135-156, probes :162-180.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import BoundaryLayer, Rectangle, Specification
from ..grids import Grid
from ..kernels import rDwendland2, wendland2
from ..ops.apply import apply_binary, apply_unary, point_sum
from ..structs import ParticleState, ParticleSystem, generate_particles
from .common import frame_runner

FLUID = 0.0
WALL = 1.0
LID = 2.0


@dataclasses.dataclass(frozen=True)
class Config:
    N: int = 100          # sample points per lid length (:29)
    Re: float = 100.0
    llid: float = 1.0
    rho0: float = 1.0
    vlid: float = 1.0
    P0: float = 5.0
    t_end: float = 0.4
    n_frames: int = 200
    dtype: str = "float64"

    @property
    def mu(self) -> float:
        return 1.0 / self.Re

    @property
    def dr(self) -> float:
        return self.llid / self.N

    @property
    def h(self) -> float:
        return 3.0 * self.dr

    @property
    def m(self) -> float:
        return self.rho0 * self.dr**2

    @property
    def c(self) -> float:
        return 20.0 * self.vlid

    @property
    def dt(self) -> float:
        return 0.1 * self.h / self.c

    @property
    def jdtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32


def make_system(cfg: Config) -> ParticleSystem:
    grid = Grid(cfg.dr, "hexagonal")
    box = Rectangle(0.0, 0.0, cfg.llid, cfg.llid)
    wall = BoundaryLayer(box, grid, cfg.h)
    lid = Specification(wall, lambda x: x[..., 1] > cfg.llid)
    side = Specification(wall, lambda x: x[..., 1] <= cfg.llid)
    sys = ParticleSystem(
        fields={"x": 2, "v": 2, "Dv": 2, "rho": 0, "Drho": 0, "P": 0, "type": 0},
        domain=box + wall, h=cfg.h, dim=2, dtype=cfg.jdtype,
        defaults={"rho": cfg.rho0})
    generate_particles(sys, grid, box, lambda xs: {"type": FLUID})
    generate_particles(sys, grid, lid, lambda xs: {"type": LID})
    generate_particles(sys, grid, side, lambda xs: {"type": WALL})
    return sys


def make_step(cfg: Config, engine):
    dt, m, c, rho0, h = cfg.dt, cfg.m, cfg.c, cfg.rho0, cfg.h

    def balance_of_mass(p, q, r):
        return {"Drho": m * rDwendland2(h, r)
                * jnp.sum((p.x - q.x) * (p.v - q.v), axis=-1)}

    def find_pressure(u):
        rho = u.rho + u.Drho * dt
        return {"rho": rho, "Drho": jnp.zeros_like(rho),
                "P": cfg.P0 + c**2 * (rho - rho0)}

    def internal_force(p, q, r):
        rDk = rDwendland2(h, r)
        x_pq = p.x - q.x
        v_pq = p.v - q.v
        # lid Dirichlet BC by linear extrapolation (:106-111)
        vlid_vec = jnp.zeros_like(v_pq).at[..., 0].set(cfg.vlid)
        s = jnp.abs(x_pq[..., 1]) / (0.1 * h + jnp.abs(p.x[..., 1] - cfg.llid))
        v_lid = s[..., None] * (p.v - vlid_vec)
        v_pq = jnp.where((q.type == LID)[..., None], v_lid, v_pq)
        dv = -(m * rDk * (p.P / p.rho**2 + q.P / q.rho**2))[..., None] * x_pq
        visc = (8.0 / (cfg.Re * p.rho * q.rho) * m * rDk
                * jnp.sum(v_pq * x_pq, axis=-1) / (r**2 + 0.01 * h**2))
        return {"Dv": dv + visc[..., None] * x_pq}

    def move(u):
        fluid = (u.type == FLUID)[:, None]
        return {"x": jnp.where(fluid, u.x + 0.5 * dt * u.v, u.x),
                "Dv": jnp.zeros_like(u.Dv)}

    def accelerate(u):
        fluid = (u.type == FLUID)[:, None]
        return {"v": jnp.where(fluid, u.v + 0.5 * dt * u.Dv, u.v)}

    def step(state: ParticleState) -> ParticleState:
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)
        state = apply_binary(engine, state, nbrs, balance_of_mass)
        state = apply_unary(state, find_pressure)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)
        state = apply_binary(engine, state, nbrs, internal_force)
        state = apply_unary(state, accelerate)
        return state

    def init(state):
        state, nbrs = engine.rebuild(state)
        state = apply_unary(state, find_pressure)
        state = apply_binary(engine, state, nbrs, internal_force)
        return state

    return step, init


def compute_fluxes(cfg: Config, engine, state: ParticleState, res: int = 100):
    """Centerline velocity profiles by Shepard-normalized SPH interpolation
    (compute_fluxes, :162-180). Returns (s, v1, v2): x-velocity along the
    y-centerline and y-velocity along the x-centerline."""
    state, nbrs = engine.rebuild(state)
    s = np.linspace(0.0, 1.0, res)
    probes_y = np.stack([np.full(res, 0.5), s], axis=-1)   # along y
    probes_x = np.stack([s, np.full(res, 0.5)], axis=-1)   # along x

    def gamma_fn(q, r):
        return (q.type == FLUID) * cfg.m * wendland2(cfg.h, r)

    def vx_fn(q, r):
        return (q.type == FLUID) * cfg.m * q.v[..., 0] * wendland2(cfg.h, r)

    def vy_fn(q, r):
        return (q.type == FLUID) * cfg.m * q.v[..., 1] * wendland2(cfg.h, r)

    g1 = point_sum(engine, state, nbrs, gamma_fn, probes_y)
    v1 = point_sum(engine, state, nbrs, vx_fn, probes_y) / jnp.maximum(g1, 1e-12)
    g2 = point_sum(engine, state, nbrs, gamma_fn, probes_x)
    v2 = point_sum(engine, state, nbrs, vy_fn, probes_x) / jnp.maximum(g2, 1e-12)
    return s, np.asarray(v1), np.asarray(v2)


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
    k = 0
    while k < n_steps:
        state = run_frame(state)
        k += steps_per_frame
        if verbose and (k // steps_per_frame) % 20 == 0:
            print(f"t = {k * cfg.dt:.4f} ({100 * k * cfg.dt / cfg.t_end:.0f}%)")
        if out:
            save_frame(out, state, "P", "v", "type", time=k * cfg.dt)
    if out:
        save_pvd_file(out)
    s, v1, v2 = compute_fluxes(cfg, sys.engine, state)
    if out:
        # the reference persists the centerline profiles as data.csv and the
        # Ghia comparison figures next to the Paraview output
        # (cavity_flow.jl:177-220)
        import os as _os
        from ..io import save_csv
        from ..utils.plots import plot_cavity
        save_csv(_os.path.join(out.path, "data.csv"),
                 {"s": s, "v1": v1, "v2": v2})
        plot_cavity(out.path, s, v1, v2, Re=cfg.Re)
    sys.state = state
    return {"s": s, "v1": v1, "v2": v2, "state": state, "system": sys}
