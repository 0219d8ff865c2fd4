"""Shared model scaffolding: jitted frame loops and observables.

Each simulation module follows the reference script skeleton (SURVEY §2.2):
constants → particle fields → geometry/make_system → physics closures →
verlet_step → main loop with PVD frames + diagnostics. Here the per-step
work is a pure function and a whole frame interval runs inside one
``lax.scan`` under ``jit`` — zero host round-trips between steps, frames
pulled to host only at frame boundaries.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from ..structs import ParticleState

__all__ = ["frame_runner", "masked_mean", "masked_max", "masked_sum",
           "maybe_resume", "maybe_checkpoint"]


def maybe_resume(cfg, state):
    """Apply the cfg-driven checkpoint contract (SURVEY §5): if
    ``cfg.resume`` names a checkpoint, return its bitwise-restored state
    and saved step counter; otherwise ``(state, 0)``. Callers must skip
    their setup/bootstrap hooks when the returned step is nonzero — the
    checkpoint already contains their effect."""
    resume = getattr(cfg, "resume", "")
    if not resume:
        return state, 0
    from ..utils.checkpoint import load_checkpoint
    state, meta = load_checkpoint(resume)
    return state, int(meta["extra"].get("step", 0))


def maybe_checkpoint(cfg, out, state, engine, k, t, frame, *,
                     last: bool = False) -> None:
    """Overwrite ``<out.path>/checkpoint.npz`` (atomically) every
    ``cfg.checkpoint_every`` frames, and always on the run's final frame
    (``last=True``) so short runs — fewer frames than the cadence — still
    leave a resume point. No-op without an output directory or with the
    feature off."""
    every = getattr(cfg, "checkpoint_every", 0)
    if not (every and out and (last or frame % every == 0)):
        return
    import os

    from ..utils.checkpoint import save_checkpoint
    save_checkpoint(os.path.join(out.path, "checkpoint.npz"), state,
                    engine=engine, extra={"step": k, "t": t})


def frame_runner(step_fn: Callable[[ParticleState], ParticleState],
                 steps_per_frame: int, finalize=None):
    """Compile ``state -> state`` advancing ``steps_per_frame`` steps in one
    ``lax.scan``. Donates the state buffer so the simulation runs in place.
    ``finalize`` (optional) runs once after the scan, inside the same jit —
    lazy-diagnostics schemes materialize frame observables there."""

    @partial(jax.jit, donate_argnums=0)
    def run_frame(state: ParticleState) -> ParticleState:
        def body(s, _):
            return step_fn(s), None
        state, _ = jax.lax.scan(body, state, None, length=steps_per_frame)
        return state if finalize is None else finalize(state)

    return run_frame


def masked_sum(val, active):
    m = active if val.ndim == 1 else active[:, None]
    return jnp.sum(jnp.where(m, val, 0))


def masked_mean(val, active):
    return masked_sum(val, active) / jnp.maximum(jnp.sum(active), 1)


def masked_max(val, active, init=0.0):
    return jnp.max(jnp.where(active, val, init))
