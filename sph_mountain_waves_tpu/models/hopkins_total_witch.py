"""Pressure–entropy mountain-wave scheme on total variables.

Rebuild of src/current/hopkins_total_witch.jl: no perturbation split — total
(ρ, P, θ, T) with direct gravity −g·ŷ (:225-228); Hopkins momentum with
per-particle kernels rDw(p.h, r), rDw(q.h, r) (:233-247 of SURVEY numbering,
file :229-263); the only current/ scheme that runs the hydrostatic packing
during setup (:141-146). Note the reference's move!/accelerate! carry **no
FLUID filter** (:269-276) — walls are dynamic here; reproduced faithfully.

Citations: particle struct :83-121, make_system :126-146, pressure passes
:168-180, density :195-210, momentum :229-263, move/accelerate :269-276,
verlet :282-306.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..kernels import rDwendland2, wendland2
from ..ops.apply import apply_binary, apply_unary
from ..structs import ParticleState, ParticleSystem
from .witch_common import (
    FLUID, WitchConfig, make_witch_system, monaghan_viscosity,
    rayleigh_damping,
)
from . import wcsph_perturbed_witch as _wcsph

FIELDS = {"h": 0, "x": 2, "m": 0, "v": 2, "Dv": 2, "rho": 0, "P": 0,
          "theta": 0, "T": 0, "type": 0, "A": 0}
EXPORT_VARS = ("v", "rho", "P", "theta", "T", "type")


def make_system(cfg: WitchConfig) -> ParticleSystem:
    sys = make_witch_system(cfg, FIELDS)
    for chunk in sys._chunks:
        chunk["A"] = chunk["P"] / chunk["rho"] ** cfg.gamma  # (:118)
    return sys


def setup(cfg: WitchConfig, engine, state: ParticleState) -> ParticleState:
    """Hydrostatic packing during setup (:141-146)."""
    from ..utils.packing import hydrostatic_packing
    return hydrostatic_packing(cfg, engine, state)


def make_step(cfg: WitchConfig, engine):
    dt = cfg.dt

    def reset_density(u):
        return {"rho": jnp.zeros_like(u.rho)}

    def compute_density(p, q, r):
        return {"rho": q.m * wendland2(p.h, r)}

    def update_smoothing(u):
        return {"h": cfg.eta * jnp.sqrt(u.m / jnp.maximum(u.rho, cfg.rho_floor))}

    def reset_pressure(u):
        return {"P": jnp.zeros_like(u.P)}

    def compute_pressure(p, q, r):
        ker = wendland2(0.5 * (p.h + q.h), r)
        return {"P": q.m * q.A ** (1.0 / cfg.gamma) * ker}

    def finalize_pressure(u):
        return {"P": u.P ** cfg.gamma}

    def find_temperature(u):
        return {"T": u.P / (cfg.R_mass * u.rho)}

    def find_pot_temp(u):
        return {"theta": u.T * ((cfg.T_bg * cfg.R_gas * cfg.rho0) / u.P) ** (2.0 / 7.0)}

    def balance_of_momentum(p, q, r):
        # Hopkins two-kernel form on total pressure (:229-263)
        x_pq = p.x - q.x
        expfac = 1.0 - 2.0 / cfg.gamma
        prefac = q.m * (p.A * q.A) ** (1.0 / cfg.gamma)
        ker_i = rDwendland2(p.h, r)
        ker_j = rDwendland2(q.h, r)
        pP = jnp.maximum(cfg.P_floor, p.P)
        qP = jnp.maximum(cfg.P_floor, q.P)
        dv = -(prefac * (pP**expfac * ker_i + qP**expfac * ker_j))[..., None] * x_pq
        return {"Dv": dv + monaghan_viscosity(cfg, p, q, r)}

    def move(u):
        return {"x": u.x + dt * u.v}  # no FLUID filter (:269-271)

    def accelerate(u):
        # direct gravity + damping, no FLUID filter (:273-276)
        acc = jnp.stack([u.Dv[:, 0],
                         u.Dv[:, 1] - cfg.g + rayleigh_damping(cfg, u.x[:, 1])],
                        axis=-1)
        return {"v": u.v + 0.5 * dt * acc, "Dv": jnp.zeros_like(u.Dv)}

    use_pallas = cfg.use_pallas and getattr(engine, "layout", "flat") == "bucket"
    if use_pallas:
        from ..ops.pallas_pairs import (
            density_pass, hopkins_momentum_pass, pressure_pass)

    def step(state: ParticleState) -> ParticleState:
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)

        if use_pallas:
            rho = density_pass(engine, state, cfg)
            state = state.replace(rho=jnp.where(state.active, rho, 0.0))
        else:
            state = apply_unary(state, reset_density)
            state = apply_binary(engine, state, nbrs, compute_density,
                                 self_interaction=cfg.self_density)
        state = apply_unary(state, update_smoothing)

        if use_pallas:
            Proot = pressure_pass(engine, state, cfg)
            state = state.replace(P=jnp.where(state.active, Proot, 0.0))
        else:
            state = apply_unary(state, reset_pressure)
            state = apply_binary(engine, state, nbrs, compute_pressure,
                                 self_interaction=cfg.self_density)
        state = apply_unary(state, finalize_pressure)

        state = apply_unary(state, find_temperature)
        state = apply_unary(state, find_pot_temp)

        if use_pallas:
            dvs = hopkins_momentum_pass(engine, state, cfg,
                                        background_split=False)
            Dv = state.fields["Dv"] + jnp.stack(dvs, axis=-1)
            state = state.replace(Dv=jnp.where(state.active[:, None], Dv, 0.0))
        else:
            state = apply_binary(engine, state, nbrs, balance_of_momentum)
        state = apply_unary(state, accelerate)
        return state

    return step


def run(cfg: WitchConfig = WitchConfig(), out_path: str | None = None,
        verbose: bool = False, packing: bool = True):
    return _wcsph._run_witch_scheme(cfg, make_system, make_step, EXPORT_VARS,
                                    out_path, verbose,
                                    setup=setup if packing else None)
