"""Pressure–entropy mountain-wave scheme, full gradient-form momentum with
background split.

Rebuild of src/current/full_hopkins_perturbed_witch.jl: like the perturbed
Hopkins scheme but the momentum is the Hopkins two-kernel P^(1−2/γ) gradient
form evaluated on the *total* state minus the same form on the *background*
state (a_tot − a_bg, :284-307), using a background entropy A_bg = P_bg/ρ_bg^γ
(:136, :198-202).

Citations: particle struct :84-155, background entropy :198-202, pressure
passes :206-224, momentum :284-318, verlet :349-374.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..kernels import rDwendland2, wendland2
from ..ops.apply import apply_binary, apply_unary
from ..structs import ParticleState, ParticleSystem
from .witch_common import (
    FLUID, WitchConfig, background_density_j, background_entropy,
    background_pot_temperature_j, make_witch_system, monaghan_viscosity,
    rayleigh_damping,
)
from . import wcsph_perturbed_witch as _wcsph
from . import hopkins_perturbed_witch as _hopkins

FIELDS = dict(_hopkins.FIELDS, A_bg=0)
EXPORT_VARS = _wcsph.EXPORT_VARS


def make_system(cfg: WitchConfig) -> ParticleSystem:
    sys = make_witch_system(cfg, FIELDS)
    for chunk in sys._chunks:
        chunk["A"] = chunk["P"] / chunk["rho"] ** cfg.gamma       # (:149)
        chunk["A_bg"] = background_entropy(cfg, chunk["x"][:, 1])  # (:136)
    return sys


def make_step(cfg: WitchConfig, engine):
    dt = cfg.dt

    def reset_density(u):
        return {"rho": jnp.zeros_like(u.rho), "rho_p": jnp.zeros_like(u.rho_p)}

    def compute_density(p, q, r):
        return {"rho": q.m * wendland2(p.h, r)}

    def finalize_density(u):
        rho_bg = background_density_j(cfg, u.x[:, 1])
        return {"rho_bg": rho_bg, "rho_p": u.rho - rho_bg}

    def update_smoothing(u):
        return {"h": cfg.eta * jnp.sqrt(u.m / jnp.maximum(u.rho, cfg.rho_floor))}

    def reset_pressure(u):
        return {"P": jnp.zeros_like(u.P), "P_p": jnp.zeros_like(u.P_p)}

    def compute_pressure(p, q, r):
        ker = wendland2(0.5 * (p.h + q.h), r)
        return {"P": q.m * q.A ** (1.0 / cfg.gamma) * ker}

    def finalize_pressure(u):
        P = u.P ** cfg.gamma
        # isothermal background: P_bg = R·T_bg·ρ_bg and A_bg = P_bg/ρ_bg^γ
        # reuse finalize_density's fresh ρ_bg — bitwise equal to
        # background_pressure_j / background_entropy_j on u.x[:, 1]
        P_bg = cfg.R_mass * cfg.T_bg * u.rho_bg
        return {"P": P, "P_bg": P_bg, "P_p": P - P_bg,
                "A_bg": P_bg / u.rho_bg ** cfg.gamma}

    def find_temperature(u):
        T = u.P / (cfg.R_mass * u.rho)
        return {"T": T, "T_p": T - u.T_bg}

    def find_pot_temp(u):
        theta = u.T * ((cfg.T_bg * cfg.R_gas * cfg.rho0) / u.P) ** (2.0 / 7.0)
        theta_bg = background_pot_temperature_j(cfg, u.x[:, 1])
        return {"theta": theta, "theta_bg": theta_bg, "theta_p": theta - theta_bg}

    def balance_of_momentum(p, q, r):
        # Hopkins two-kernel gradient on total minus background (:284-307)
        x_pq = p.x - q.x
        expfac = 1.0 - 2.0 / cfg.gamma
        ker_i = rDwendland2(p.h, r)
        ker_j = rDwendland2(q.h, r)

        prefac = q.m * (p.A * q.A) ** (1.0 / cfg.gamma)
        pP = jnp.maximum(cfg.P_floor, p.P)
        qP = jnp.maximum(cfg.P_floor, q.P)
        a_tot = -(prefac * (pP**expfac * ker_i + qP**expfac * ker_j))[..., None] * x_pq

        prefac_bg = q.m * (p.A_bg * q.A_bg) ** (1.0 / cfg.gamma)
        pPb = jnp.maximum(cfg.P_floor, p.P_bg)
        qPb = jnp.maximum(cfg.P_floor, q.P_bg)
        a_bg = -(prefac_bg * (pPb**expfac * ker_i + qPb**expfac * ker_j))[..., None] * x_pq

        return {"Dv": a_tot - a_bg + monaghan_viscosity(cfg, p, q, r)}

    def move(u):
        fluid = (u.type == FLUID)[:, None]
        return {"x": jnp.where(fluid, u.x + dt * u.v, u.x)}

    def accelerate(u):
        fluid = (u.type == FLUID)[:, None]
        buoy = -cfg.g * u.rho_p / jnp.maximum(u.rho, cfg.rho_floor)
        acc = jnp.stack([u.Dv[:, 0],
                         u.Dv[:, 1] + buoy + rayleigh_damping(cfg, u.x[:, 1])],
                        axis=-1)
        return {"v": jnp.where(fluid, u.v + 0.5 * dt * acc, u.v),
                "Dv": jnp.zeros_like(u.Dv)}

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
        state = apply_unary(state, finalize_density)
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
                                        background_split=True)
            Dv = state.fields["Dv"] + jnp.stack(dvs, axis=-1)
            state = state.replace(Dv=jnp.where(state.active[:, None], Dv, 0.0))
        else:
            state = apply_binary(engine, state, nbrs, balance_of_momentum)
        state = apply_unary(state, accelerate)
        return state

    return step


def run(cfg: WitchConfig = WitchConfig(), out_path: str | None = None,
        verbose: bool = False):
    return _wcsph._run_witch_scheme(cfg, make_system, make_step, EXPORT_VARS,
                                    out_path, verbose)
