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

__all__ = ["save_checkpoint", "load_checkpoint", "atomic_savez"]


def save_checkpoint(path: str, state: ParticleState, engine=None,
                    extra: dict | None = None) -> None:
    """Write state (bitwise) + engine config + optional scalars to ``path``."""
    arrays = {f"field:{k}": np.asarray(v) for k, v in state.fields.items()}
    arrays["active"] = np.asarray(state.active)
    meta = {"extra": extra or {}, "format": "slots"}
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
    atomic_savez(path, arrays)


def atomic_savez(path: str, arrays: dict) -> None:
    """Write an npz atomically: a crash mid-write must never destroy the
    previous good checkpoint (the overwritten file IS the resume point), so
    compress to <path>.tmp and os.replace into place."""
    import os

    if not path.endswith(".npz"):
        path = path + ".npz"
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:  # file handle: savez must not append .npz
        np.savez_compressed(fh, **arrays)
    os.replace(tmp, path)


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
    fmt = meta.get("format", "slots")
    if fmt != "slots":
        raise ValueError(
            f"{path} is a {fmt!r}-format checkpoint (compact rows from a "
            "sharded run) — restore it with parallel.bucket."
            "load_checkpoint_bucket / run_sharded_witch_bucket(resume=)")
    return ParticleState(fields=fields, active=active), meta


def engine_from_meta(meta: dict):
    from ..ops.neighbors import NeighborEngine
    e = meta["engine"]
    return NeighborEngine(dim=e["dim"], h=e["h"], phase=tuple(e["phase"]),
                          lims=tuple(e["lims"]), cap=e["cap"],
                          mins=tuple(e["mins"]), maxs=tuple(e["maxs"]),
                          pair_mode=e["pair_mode"], layout=e["layout"],
                          skin=e["skin"])
