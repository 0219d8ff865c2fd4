"""Entropy-based SPH (GENERIC / Pavelka) mountain-wave scheme, total
variables, continuity-equation density.

Rebuild of src/current/pavelka_total_witch.jl: density evolves by
balance_of_mass with a δ-SPH-style diffusion 2ν/ρ(ρp−ρq) (:195-201 — note
the reference applies the diffusion term *without* a kernel factor, which is
reproduced); adaptive smoothing rate Dh = −(h/2ρ)Dρ (:177-186); entropy S
with viscous production (:168-175); temperature from (ρ, s) via the GENERIC
relation T = ρ^{γ−1}·exp(s/(ρ·cv))/(cv(γ−1)) (:144-154); EOS P = RρT
(:156-160); laminar Monaghan viscosity in the momentum (:132-137). The
reference calls ``atmo_packing.packing`` at setup (:117) — a path broken as
committed (SURVEY §2.4); here it is the fixed Colagrossi packing.

The velocity field is called ``u`` in the reference; stored as ``v`` here
(the engine's diagnostics convention) and exported as ``v``.

Citations: constants :25-64, particle struct :70-99, make_system :103-126,
momentum :132-137, thermo :144-166, entropy production :168-175, smoothing
:177-193, mass balance :195-201, damping (disabled, returns 0) :206-216,
move/accelerate :222-232, verlet :238-255.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..kernels import rDwendland2
from ..ops.apply import apply_binary, apply_unary
from ..structs import ParticleState, ParticleSystem
from .witch_common import FLUID, WitchConfig, make_witch_system
from . import wcsph_perturbed_witch as _wcsph

FIELDS = {"h": 0, "Dh": 0, "x": 2, "m": 0, "v": 2, "Dv": 2, "rho": 0,
          "Drho": 0, "P": 0, "theta": 0, "S": 0, "s": 0, "T": 0,
          "gGamma": 2, "type": 0}
EXPORT_VARS = ("v", "rho", "P", "theta", "T", "type")


@dataclasses.dataclass(frozen=True)
class PavelkaConfig(WitchConfig):
    mu: float = 1.0  # dynamic viscosity (:36 — set to 1.0, not air's value)
    # The reference's density diffusion is ``2ν/ρ·(ρp−ρq)`` with NO kernel
    # factor (:199-200) — dimensionally a rate per *pair*, it drives ρ to
    # blow up within a few steps (NaN → particles removed via the find_key
    # NaN path, src/structs.jl:98-105; the committed reference run is broken,
    # SURVEY §2.4). fixed_diffusion=True (default) uses the standard
    # Molteni–Colagrossi δ-SPH term 2ν(ρp−ρq)·(q.m/q.ρ)·rDw — same ν = δhc.
    fixed_diffusion: bool = True


def make_system(cfg: PavelkaConfig) -> ParticleSystem:
    sys = make_witch_system(cfg, FIELDS)
    for chunk in sys._chunks:
        # S = m cv log(cv T (γ−1) / (γ ρ^{γ−1})) (:97)
        T, rho, m = chunk["T"], chunk["rho"], chunk["m"]
        chunk["S"] = m * cfg.cv * np.log(
            (cfg.cv * T * (cfg.gamma - 1.0)) / (cfg.gamma * rho ** (cfg.gamma - 1.0)))
    return sys


def setup(cfg: PavelkaConfig, engine, state: ParticleState) -> ParticleState:
    """Colagrossi packing + initial operator passes (make_system :117-125)."""
    from ..utils.packing import colagrossi_packing
    state = colagrossi_packing(cfg, engine, state, 1e-10, 1e-10, 100)
    step_parts = make_step(cfg, engine, parts=True)
    state, nbrs = engine.rebuild(state)
    state = apply_binary(engine, state, nbrs, step_parts["balance_of_mass"])
    state = apply_unary(state, step_parts["balance_of_smoothing"])
    state = apply_unary(state, step_parts["find_s"])
    state = apply_unary(state, step_parts["set_temperature"])
    state = apply_unary(state, step_parts["set_pressure"])
    state = apply_binary(engine, state, nbrs, step_parts["balance_of_momentum"])
    return state


def make_step(cfg: PavelkaConfig, engine, parts: bool = False):
    dt = cfg.dt

    def balance_of_mass(p, q, r):
        # Drho += ρp (q.m/q.rho) rDw(h_ij, r) x_pq·u_pq  (+ diffusion, f-f)
        ker = (q.m / q.rho) * rDwendland2(0.5 * (p.h + q.h), r)
        conv = p.rho * ker * jnp.sum((p.x - q.x) * (p.v - q.v), axis=-1)
        both = (p.type == FLUID) & (q.type == FLUID)
        if cfg.fixed_diffusion:
            diff = 2.0 * cfg.nu * (p.rho - q.rho) * ker
        else:  # reference-faithful (:199-200) — numerically divergent
            diff = 2.0 * cfg.nu / p.rho * (p.rho - q.rho)
        return {"Drho": conv + jnp.where(both, diff, 0.0)}

    def balance_of_smoothing(u):
        return {"Dh": u.Dh - 0.5 * (u.h / u.rho) * u.Drho}  # (:177-180)

    def update_smoothing(u):
        fluid = u.type == FLUID
        return {"h": jnp.where(fluid, u.h + dt * u.Dh, u.h),
                "Dh": jnp.zeros_like(u.Dh)}

    def update_density(u):
        fluid = u.type == FLUID
        return {"rho": jnp.where(fluid, u.rho + dt * u.Drho, u.rho),
                "Drho": jnp.zeros_like(u.Drho)}

    def find_s(u):
        fluid = u.type == FLUID
        return {"s": jnp.where(fluid, u.S * u.rho / u.m, u.s)}

    def set_temperature(u):
        fluid = u.type == FLUID
        T = (u.rho ** (cfg.gamma - 1.0)) * jnp.exp(
            u.s / (u.rho * cfg.cv)) / (cfg.cv * (cfg.gamma - 1.0))
        return {"T": jnp.where(fluid, T, u.T)}

    def set_pressure(u):
        fluid = u.type == FLUID
        return {"P": jnp.where(fluid, cfg.R_mass * u.rho * u.T, u.P)}

    def find_pot_temp(u):
        fluid = u.type == FLUID
        theta = u.T * (((cfg.T_bg * cfg.R_gas * cfg.rho0) / u.P) ** 2) ** (1.0 / 7.0)
        return {"theta": jnp.where(fluid, theta, u.theta)}

    def entropy_production(p, q, r):
        # viscous entropy production, fluid-fluid, dt baked in (:168-175)
        both = (p.type == FLUID) & (q.type == FLUID)
        ker = (q.m / q.rho) * rDwendland2(0.5 * (p.h + q.h), r)
        dot_ux = jnp.sum((p.v - q.v) * (p.x - q.x), axis=-1)
        dS = (-4.0 * p.m * q.m * p.rho * ker * cfg.mu
              / (p.T * p.rho * q.rho) * dot_ux**2
              / (r * r + 0.01 * p.h * q.h) * dt)
        return {"S": jnp.where(both, dS, 0.0)}

    def balance_of_momentum(p, q, r):
        # pressure gradient + laminar Monaghan viscosity (:132-137)
        ker = (q.m / q.rho) * rDwendland2(0.5 * (p.h + q.h), r)
        x_pq = p.x - q.x
        du = -(p.rho * ker * (p.P / p.rho**2 + q.P / q.rho**2))[..., None] * x_pq
        visc = (p.rho * 8.0 * ker * cfg.mu / (p.rho * q.rho)
                * jnp.sum((p.v - q.v) * x_pq, axis=-1)
                / (r * r + 0.0025 * (p.h + q.h) ** 2))
        return {"Dv": du + visc[..., None] * x_pq}

    def move(u):
        fluid = (u.type == FLUID)[:, None]
        return {"x": jnp.where(fluid, u.x + dt * u.v, u.x)}

    def accelerate(u):
        # u += dt/2 (Du − g·ŷ); reference damping disabled (:206-216)
        fluid = (u.type == FLUID)[:, None]
        acc = jnp.stack([u.Dv[:, 0], u.Dv[:, 1] - cfg.g], axis=-1)
        return {"v": jnp.where(fluid, u.v + 0.5 * dt * acc, u.v),
                "Dv": jnp.zeros_like(u.Dv)}

    if parts:
        return dict(balance_of_mass=balance_of_mass,
                    balance_of_smoothing=balance_of_smoothing,
                    find_s=find_s, set_temperature=set_temperature,
                    set_pressure=set_pressure,
                    balance_of_momentum=balance_of_momentum)

    use_pallas = cfg.use_pallas and getattr(engine, "layout", "flat") == "bucket"
    if use_pallas:
        from ..ops.pallas_pairs import (
            pavelka_mass_pass, pavelka_momentum_entropy_pass)

    def step(state: ParticleState) -> ParticleState:
        # verlet_step! (:238-255)
        state = apply_unary(state, accelerate)
        state = apply_unary(state, move)
        state, nbrs = engine.rebuild(state)

        if use_pallas:
            drho = pavelka_mass_pass(engine, state, cfg)
            Drho = state.fields["Drho"] + drho
            state = state.replace(Drho=jnp.where(state.active, Drho, 0.0))
        else:
            state = apply_binary(engine, state, nbrs, balance_of_mass)
        state = apply_unary(state, balance_of_smoothing)
        state = apply_unary(state, update_smoothing)
        state = apply_unary(state, update_density)

        state = apply_unary(state, find_s)
        state = apply_unary(state, set_temperature)
        state = apply_unary(state, set_pressure)
        state = apply_unary(state, find_pot_temp)
        if use_pallas:
            # fused sweep: entropy production + momentum share ker and x·v
            *dvs, dS = pavelka_momentum_entropy_pass(engine, state, cfg)
            S = state.fields["S"] + dS
            Dv = state.fields["Dv"] + jnp.stack(dvs, axis=-1)
            state = state.replace(
                S=jnp.where(state.active, S, 0.0),
                Dv=jnp.where(state.active[:, None], Dv, 0.0))
        else:
            state = apply_binary(engine, state, nbrs, entropy_production)
            state = apply_binary(engine, state, nbrs, balance_of_momentum)
        state = apply_unary(state, accelerate)
        return state

    return step


def run(cfg: PavelkaConfig | None = None, out_path: str | None = None,
        verbose: bool = False, packing: bool = True):
    cfg = cfg or PavelkaConfig()
    return _wcsph._run_witch_scheme(cfg, make_system, make_step, EXPORT_VARS,
                                    out_path, verbose,
                                    setup=setup if packing else None)
