"""Pressure–entropy (Hopkins 2013 / PSPH) mountain-wave scheme,
perturbation form.

Rebuild of src/current/hopkins_perturbed_witch.jl: each particle carries an
entropy-like variable A = P/ρ^γ (:147); the smoothed pressure is
P̄ = (Σ m A^{1/γ} W)^γ (:205-214) with P′ = P̄ − P_bg (:213); momentum is the
same perturbation form + Monaghan artificial viscosity as the WCSPH scheme
(:276-301); per-particle adaptive h = η√(m/ρ) (:250-253).

Citations: particle struct :84-151, pressure passes :200-214, thermo
:220-229, density :235-253, momentum :276-301, verlet :324-349.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..kernels import rDwendland2, wendland2
from ..ops.apply import apply_binary, apply_unary
from ..structs import ParticleState, ParticleSystem
from .witch_common import (
    FLUID, WitchConfig, background_density_j, background_pot_temperature_j,
    make_witch_system, monaghan_viscosity, rayleigh_damping,
)
from . import wcsph_perturbed_witch as _wcsph

FIELDS = dict(_wcsph.FIELDS, A=0)
EXPORT_VARS = _wcsph.EXPORT_VARS


def make_system(cfg: WitchConfig) -> ParticleSystem:
    sys = make_witch_system(cfg, FIELDS)
    for chunk in sys._chunks:  # A = P/ρ^γ at init (:147)
        chunk["A"] = chunk["P"] / chunk["rho"] ** cfg.gamma
    return sys


def make_step(cfg: WitchConfig, engine):
    dt = cfg.dt

    def reset_density(u):
        return {"rho": jnp.zeros_like(u.rho), "rho_p": jnp.zeros_like(u.rho_p)}

    def compute_density(p, q, r):
        return {"rho": q.m * wendland2(p.h, r)}  # (:241-243)

    def finalize_density(u):
        rho_bg = background_density_j(cfg, u.x[:, 1])
        return {"rho_bg": rho_bg, "rho_p": u.rho - rho_bg}

    def update_smoothing(u):
        return {"h": cfg.eta * jnp.sqrt(u.m / jnp.maximum(u.rho, cfg.rho_floor))}

    def reset_pressure(u):
        return {"P": jnp.zeros_like(u.P), "P_p": jnp.zeros_like(u.P_p)}

    def compute_pressure(p, q, r):
        # P += q.m q.A^(1/γ) W(h_ij, r)  (:205-208)
        ker = wendland2(0.5 * (p.h + q.h), r)
        return {"P": q.m * q.A ** (1.0 / cfg.gamma) * ker}

    def finalize_pressure(u):
        P = u.P ** cfg.gamma  # (:210-214)
        # P_bg = R·T_bg·ρ_bg (isothermal): reuse finalize_density's fresh
        # ρ_bg — bitwise equal to background_pressure_j(cfg, y)
        P_bg = cfg.R_mass * cfg.T_bg * u.rho_bg
        return {"P": P, "P_bg": P_bg, "P_p": P - P_bg}

    def find_temperature(u):
        T = u.P / (cfg.R_mass * u.rho)
        return {"T": T, "T_p": T - u.T_bg}

    def find_pot_temp(u):
        theta = u.T * ((cfg.T_bg * cfg.R_gas * cfg.rho0) / u.P) ** (2.0 / 7.0)
        theta_bg = background_pot_temperature_j(cfg, u.x[:, 1])
        return {"theta": theta, "theta_bg": theta_bg, "theta_p": theta - theta_bg}

    def balance_of_momentum(p, q, r):
        # perturbation pressure gradient + artificial viscosity (:276-301)
        h_ij = 0.5 * (p.h + q.h)
        ker = rDwendland2(h_ij, r)
        prho = jnp.maximum(p.rho, cfg.rho_floor)
        qrho = jnp.maximum(q.rho, cfg.rho_floor)
        dv = -(q.m * (p.P_p / prho**2 + q.P_p / qrho**2) * ker)[..., None] * (p.x - q.x)
        return {"Dv": dv + monaghan_viscosity(cfg, p, q, r, h_ij)}

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
        from ..ops.pallas_pairs import density_pass, momentum_pass, pressure_pass

    def step(state: ParticleState) -> ParticleState:
        # verlet_step! (:324-349); the mid-step rebuild is a no-op here
        # (fixed cell size, unchanged positions) and is elided
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
            dv0, dv1 = momentum_pass(engine, state, cfg)
            Dv = state.fields["Dv"] + jnp.stack([dv0, dv1], axis=-1)
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
