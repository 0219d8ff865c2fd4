"""Two-chamber gas expansion through a slit — statistical-mechanics
experiment.

Rebuild of src/legacy/adiabatic_mass.jl: gas with seeded Maxwell–Boltzmann
random initial velocities fills the left chamber (:128-139); a slit opens in
the dividing wall (WALL → EMPTY, :131-136); the gas expands into the right
chamber. Lennard-Jones wall repulsion (:167-169 smoothed form), entropy
thermodynamics T(ρ, s), P = (γ−1)ρT·cv (:230-238), viscous entropy
production (:272-279), energy/entropy budget (:293-308), count-left-chamber
observable with an exponential fit (:435-453, LsqFit replaced by a linear
log-space fit), and the kernel Gram-matrix determinant check via dense
assembly (:481-491).

Citations as inline comments into src/legacy/adiabatic_mass.jl.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import BoundaryLayer, Rectangle
from ..grids import Grid
from ..kernels import rDwendland2, wendland2
from ..ops.apply import apply_binary, apply_unary, pair_sum
from ..structs import ParticleState, ParticleSystem, generate_particles
from .common import frame_runner, masked_sum

FLUID = 0.0
WALL = 1.0
EMPTY = 2.0


@dataclasses.dataclass(frozen=True)
class Config:
    dr: float = 2.0e-2
    g: float = -9.8
    mu: float = 0.0
    gamma: float = 1.4
    cv: float = 1.0
    p0: float = 10.0
    rho0: float = 10.0
    box_height: float = 1.0
    box_width: float = 1.0
    t_end: float = 10.0
    n_frames: int = 1000
    seed: int = 42
    eps: float = 1e-6
    dtype: str = "float64"

    @property
    def h(self) -> float:
        return 3.0 * self.dr

    @property
    def c0(self) -> float:
        return float(np.sqrt(self.p0 * self.gamma / self.rho0))

    @property
    def m0(self) -> float:
        return self.rho0 * self.dr**2

    @property
    def S0(self) -> float:
        return self.m0 * self.cv * np.log(self.p0 / (self.gamma
                                                     * self.rho0**self.gamma))

    @property
    def T0(self) -> float:
        return (self.gamma * self.rho0 ** (self.gamma - 1)
                / (self.cv * (self.gamma - 1))
                * np.exp(self.S0 / (self.m0 * self.cv)))

    @property
    def sigma(self) -> float:
        KB = 1.380649e-23
        return float(np.sqrt(KB * self.T0 / self.m0))

    @property
    def wall_width(self) -> float:
        return 2.5 * self.dr

    @property
    def slit_height(self) -> float:
        return self.box_height / 10

    @property
    def dr_wall(self) -> float:
        return 0.95 * self.dr

    @property
    def E_wall(self) -> float:
        return 10 * abs(self.g)

    @property
    def dt(self) -> float:
        return 0.001 * self.h / self.c0

    @property
    def jdtype(self):
        return jnp.float64 if self.dtype == "float64" else jnp.float32


FIELDS = {"x": 2, "m": 0, "S": 0, "v": 2, "a": 2, "rho": 0, "s": 0,
          "P": 0, "T": 0, "type": 0, "Drho": 0, "Ds": 0}


def make_system(cfg: Config) -> ParticleSystem:
    """Two chambers + dividing wall with a slit (make_system, :111-141)."""
    grid = Grid(cfg.dr, "square")
    bw, bh, ww = cfg.box_width, cfg.box_height, cfg.wall_width
    boxL = Rectangle(0.0, 0.0, bw - ww / 2, bh)
    boxR = Rectangle(bw + ww / 2, 0.0, 2 * bw, bh)
    wallL = BoundaryLayer(boxL, grid, ww)
    wallR = BoundaryLayer(boxR, grid, ww)
    sys = ParticleSystem(fields=FIELDS, domain=boxL + wallL + wallR, h=cfg.h,
                         dim=2, dtype=cfg.jdtype,
                         defaults={"m": cfg.m0, "S": cfg.S0})
    generate_particles(sys, grid, boxL, lambda xs: {"type": FLUID})
    generate_particles(sys, grid, wallL, lambda xs: {"type": WALL})
    generate_particles(sys, grid, wallR, lambda xs: {"type": WALL})

    rng = np.random.default_rng(cfg.seed)  # seeded MB velocities (:128-139)
    for chunk in sys._chunks:
        x, t = chunk["x"], chunk["type"]
        slit = ((t == WALL)
                & (x[:, 0] >= bw - ww) & (x[:, 0] <= bw + ww)
                & (x[:, 1] >= bh / 2 - cfg.slit_height)
                & (x[:, 1] <= bh / 2 + cfg.slit_height))
        chunk["type"] = np.where(slit, EMPTY, t)
        fluid = chunk["type"] == FLUID
        chunk["v"] = np.where(fluid[:, None],
                              rng.normal(0, cfg.sigma, size=x[:, :2].shape),
                              0.0)
    return sys


def make_step(cfg: Config, engine):
    dt, h, m0 = cfg.dt, cfg.h, cfg.m0

    def both_fluid(p, q):
        return (p.type == FLUID) & (q.type == FLUID)

    def internal_force(p, q, r):
        ker = q.m * rDwendland2(h, r)
        x_pq = p.x - q.x
        a_ff = -(ker * (p.P / p.rho**2 + q.P / q.rho**2))[..., None] * x_pq
        visc = (8.0 * ker * cfg.mu / (p.rho * q.rho)
                * jnp.sum((p.v - q.v) * x_pq, axis=-1)
                / (r * r + 0.01 * h * h))
        a_ff = a_ff + visc[..., None] * x_pq
        # smoothed LJ wall (:167-169)
        s2 = (cfg.dr_wall**2 + cfg.eps**2) / (r**2 + cfg.eps**2)
        lj = (-cfg.E_wall / (r**2 + cfg.eps**2) * (s2 - s2**2))[..., None] * x_pq
        fw = (p.type == FLUID) & (q.type == WALL) & (r < cfg.dr_wall)
        return {"a": jnp.where(both_fluid(p, q)[..., None], a_ff, 0.0)
                + jnp.where(fw[..., None], lj, 0.0)}

    def find_rho(p, q, r):
        return {"rho": jnp.where(both_fluid(p, q), q.m * wendland2(h, r), 0.0)}

    def find_s(u):
        fl = u.type == FLUID
        return {"s": jnp.where(fl, u.S * u.rho / jnp.maximum(u.m, 1e-30), u.s)}

    def find_P(u):
        fl = u.type == FLUID
        T = (u.rho ** (cfg.gamma - 1.0)) * jnp.exp(
            u.s / jnp.maximum(u.rho, 1e-30) / cfg.cv) / (cfg.cv * (cfg.gamma - 1.0))
        T = jnp.where(fl, T, u.T)
        return {"T": T,
                "P": jnp.where(fl, (cfg.gamma - 1.0) * u.rho * T * cfg.cv, u.P)}

    def entropy_production(p, q, r):
        both = both_fluid(p, q)
        ker = rDwendland2(h, r)
        dux = jnp.sum((p.v - q.v) * (p.x - q.x), axis=-1)
        dS = (-4.0 * p.m * q.m * ker * cfg.mu / (p.T * p.rho * q.rho)
              * dux**2 / (r * r + 0.01 * h * h) * dt)
        return {"S": jnp.where(both, dS, 0.0)}

    def reset_a(u):
        return {"a": jnp.zeros_like(u.a)}

    def move(u):
        fl = (u.type == FLUID)[:, None]
        return {"x": jnp.where(fl, u.x + dt * u.v, u.x),
                "a": jnp.zeros_like(u.a),
                "rho": jnp.where(u.type == FLUID, 0.0, u.rho)}

    def accelerate(u):
        fl = (u.type == FLUID)[:, None]
        return {"v": jnp.where(fl, u.v + 0.5 * dt * u.a, u.v)}

    def step(state: ParticleState) -> ParticleState:
        # verlet_step! (:316-334)
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)
        state = apply_unary(state, reset_a)
        state = apply_binary(engine, state, nbrs, find_rho, self_interaction=True)
        state = apply_unary(state, find_s)
        state = apply_unary(state, find_P)
        state = apply_binary(engine, state, nbrs, entropy_production)
        state = apply_binary(engine, state, nbrs, internal_force)
        state = apply_unary(state, accelerate)
        return state

    def init(state):
        state, nbrs = engine.rebuild(state)
        state = apply_binary(engine, state, nbrs, find_rho, self_interaction=True)
        state = apply_unary(state, find_s)
        state = apply_unary(state, find_P)
        state = apply_binary(engine, state, nbrs, internal_force)
        return state

    return step, init


def observables(cfg: Config, engine, state: ParticleState, nbrs=None):
    """(left count, E_tot, E_kin, E_int, E_wall, S) (:293-308, :285-291)."""
    f = state.fields
    act = state.active
    fluid = act & (f["type"] == FLUID)
    left = jnp.sum(fluid & (f["x"][:, 0] <= cfg.box_width))
    E_kin = masked_sum(0.5 * cfg.m0 * jnp.sum(f["v"] ** 2, axis=-1), fluid)
    E_int = masked_sum(f["m"] * cfg.cv * f["T"], fluid)

    def LJ_pot(p, q, r):
        s2 = (cfg.dr_wall**2 + cfg.eps**2) / (r**2 + cfg.eps**2)
        val = cfg.m0 * cfg.E_wall * (0.25 * s2**2 - 0.5 * s2 + 0.25)
        on = (p.type == FLUID) & (q.type == WALL) & (r < cfg.dr_wall)
        return jnp.where(on, val, 0.0)

    if nbrs is None:
        state, nbrs = engine.rebuild(state)
    E_wall = jnp.sum(pair_sum(engine, state, nbrs, LJ_pot))
    S = masked_sum(f["S"], fluid)
    E_tot = E_kin + E_int + E_wall
    return (int(left), float(E_tot), float(E_kin), float(E_int),
            float(E_wall), float(S))


def fit_left_decay(times: np.ndarray, lefts: np.ndarray):
    """Exponential fit l(t) = A·exp(−λt) + C (reference plot_left with
    LsqFit, :435-453) via least squares on (A, λ) with C = final value."""
    C = lefts[-1]
    y = np.maximum(lefts - C, 1e-9)
    sel = y > max(1.0, 0.01 * y[0])
    if sel.sum() < 2:
        return 0.0, 0.0, C
    coeffs = np.polyfit(times[sel], np.log(y[sel]), 1)
    lam, logA = -coeffs[0], coeffs[1]
    return float(np.exp(logA)), float(lam), float(C)


def gram_determinant(cfg: Config, engine, state: ParticleState) -> float:
    """Kernel Gram-matrix determinant check (:481-491): W_ab = w(h, r_ab),
    dense assembly (small systems)."""
    from ..ops.solvers import assemble_matrix
    state, nbrs = engine.rebuild(state)
    W = assemble_matrix(engine, state, nbrs,
                        lambda p, q, r: wendland2(cfg.h, r))
    act = np.asarray(state.active)
    Wd = np.asarray(W)[np.ix_(act, act)]
    sign, logdet = np.linalg.slogdet(Wd)
    return float(sign * np.exp(logdet / max(len(Wd), 1)))  # scaled determinant


def run(cfg: Config = Config(), out_path: str | None = None,
        verbose: bool = False):
    from ..io import new_pvd_file, save_frame, save_pvd_file

    sys = make_system(cfg)
    state = sys.freeze()
    step, init = make_step(cfg, sys.engine)
    state = jax.jit(init)(state)

    n_steps = int(round(cfg.t_end / cfg.dt))
    steps_per_frame = max(1, n_steps // cfg.n_frames)
    run_frame = frame_runner(step, steps_per_frame)
    out = new_pvd_file(out_path) if out_path else None
    ts, lefts, Es, Ss = [], [], [], []
    k = 0
    while k < n_steps:
        state = run_frame(state)
        k += steps_per_frame
        left, E_tot, E_kin, E_int, E_wall, S = observables(cfg, sys.engine, state)
        ts.append(k * cfg.dt); lefts.append(left); Es.append(E_tot); Ss.append(S)
        if verbose:
            print(f"t = {ts[-1]:.3f}  left = {left}  E = {E_tot:.4e}  S = {S:.4e}")
        if out:
            save_frame(out, state, "v", "P", "rho", "T", "type", time=ts[-1])
    if out:
        save_pvd_file(out)
    sys.state = state
    return {"t": np.asarray(ts), "left": np.asarray(lefts),
            "E": np.asarray(Es), "S": np.asarray(Ss),
            "state": state, "system": sys}
