"""Exact checkpoint/resume.

The reference's VTP/PVD frames double as checkpoints (import_particles!,
src/IO.jl:83-122 — kept API-compatible in io.py). SURVEY §5 calls for an
additional *exact* checkpoint for bitwise resume: this module saves the full
ParticleState (every field incl. engine-internal ones like ``_xref``, the
active mask, and the engine configuration) as a compressed npz; loading
restores bit-identical state so a resumed run continues exactly.
"""
from __future__ import annotations

import json

import jax.numpy as jnp
import numpy as np

from ..structs import ParticleState

__all__ = ["save_checkpoint", "load_checkpoint"]


def save_checkpoint(path: str, state: ParticleState, engine=None,
                    extra: dict | None = None) -> None:
    """Write state (bitwise) + engine config + optional scalars to ``path``."""
    arrays = {f"field:{k}": np.asarray(v) for k, v in state.fields.items()}
    arrays["active"] = np.asarray(state.active)
    meta = {"extra": extra or {}}
    if engine is not None:
        meta["engine"] = {
            "dim": engine.dim, "h": engine.h, "phase": list(engine.phase),
            "lims": list(engine.lims), "cap": engine.cap,
            "mins": list(engine.mins), "maxs": list(engine.maxs),
            "pair_mode": engine.pair_mode, "layout": engine.layout,
            "skin": engine.skin,
        }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)


def load_checkpoint(path: str):
    """Return (state, meta). ``meta['engine']`` (if saved) reconstructs the
    NeighborEngine via ``engine_from_meta``."""
    data = np.load(path if path.endswith(".npz") else path + ".npz")
    fields = {}
    active = None
    meta = {}
    for k in data.files:
        if k == "__meta__":
            meta = json.loads(bytes(data[k].tobytes()).decode())
        elif k == "active":
            active = jnp.asarray(data[k])
        elif k.startswith("field:"):
            fields[k[len("field:"):]] = jnp.asarray(data[k])
    return ParticleState(fields=fields, active=active), meta


def engine_from_meta(meta: dict):
    from ..ops.neighbors import NeighborEngine
    e = meta["engine"]
    return NeighborEngine(dim=e["dim"], h=e["h"], phase=tuple(e["phase"]),
                          lims=tuple(e["lims"]), cap=e["cap"],
                          mins=tuple(e["mins"]), maxs=tuple(e["maxs"]),
                          pair_mode=e["pair_mode"], layout=e["layout"],
                          skin=e["skin"])
