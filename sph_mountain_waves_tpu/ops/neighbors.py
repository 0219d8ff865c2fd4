"""Neighbor engine (L3): cell-sorted, fixed-capacity-bucket spatial hashing.

This replaces the reference's lock-based threaded cell list
(src/core.jl:51-90 create_cell_list!; src/structs.jl:22-31 Cell with
ReentrantLock; :97-106 find_key) with a functional, jit-compiled pipeline:

  1. containment/finiteness screen → ``active`` mask update (reference
     removal semantics: out-of-domain particles disappear, src/core.jl:63-81;
     NaN positions map to key −1 and are removed, src/structs.jl:98-105),
  2. per-axis cell coordinates with the reference's exact key arithmetic
     (``floor(x/h) − key_phase``, flat index i + Lx·j + Lx·Ly·k),
  3. stable sort of all particle fields by cell key (inactive → trash key),
  4. per-cell counts/starts by segment add + exclusive cumsum,
  5. a dense bucket table ``[num_cells+1, cap]`` of particle slots.

Pair interaction then consumes the 9/27-cell stencil (reference key_diff,
src/structs.jl:70-82) by gathering whole buckets and masking — a pure
gather + reduce, no scatter in the hot loop, and deterministic accumulation
order (the reference's thread-arrival nondeterminism, src/core.jl:122-123,
is eliminated by construction).

The sort keeps segments contiguous, so bucket gathers are near-sequential in
HBM. Rebuild cadence is the model's choice; reference schemes rebuild 2× per
step (SURVEY §3.1).
"""
from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..structs import ParticleState

__all__ = ["NeighborEngine", "Neighbors", "sorted_slot_scatter"]


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class Neighbors:
    """Device-side neighbor structure for one rebuilt configuration."""
    cell: jnp.ndarray       # [N, dim] int32 per-axis cell coords (clipped)
    key: jnp.ndarray        # [N] int32 flat cell key; num_cells = trash
    rank: jnp.ndarray       # [N] int32 slot within the cell (sorted order)
    counts: jnp.ndarray     # [num_cells+1] int32 particles per cell
    starts: jnp.ndarray     # [num_cells+1] int32 exclusive prefix
    bucket: jnp.ndarray     # [num_cells+1, cap] int32 particle slots (0-pad)
    overflow: jnp.ndarray   # [] int32: flat layout = max count beyond cap;
    #                         bucket layout = rows dropped at this rescatter


def sorted_slot_scatter(key, fields, C: int, cap: int, slots: int):
    """Move ``fields`` (name → [n] or [n, d] array) into bucket-slot layout
    [slots] / [slots, d].

    The expensive random data movement is ONE variadic stable ``lax.sort``
    keyed on the flat cell key carrying every field component as a payload
    (measured ~1 ms per payload at 2M slots vs ~28 ms for a random gather —
    the sort network's movement is structured). The sorted rows then land in
    their slots with one per-field scatter whose indices are near-monotonic
    (sorted keys), replacing the gather+scatter pair of the naive move.

    Each field is scattered into its own whole output buffer — do NOT be
    tempted to batch the scatters through one column-stacked block: deriving
    every output of a ``lax.cond`` branch from a single temp buffer was
    measured to impose a ~2.2 ms/step tax on every NON-rescatter step of the
    enclosing scan at 108k (XLA copy/buffer assignment around the
    conditional), wiping out far more than the batching saves.

    ``key`` must equal C for rows to drop (inactive/out-of-domain); rows
    whose cell overflows ``cap`` are dropped and counted. Returns
    (fields_in_slot_layout, active, overflow). Slot occupancy IS the new
    active mask (key < C implies an active row).
    """
    n = key.shape[0]
    comps, meta = [], []  # flattened [n] components + (name, ncomp, dtype)
    for name, arr in fields.items():
        if arr.ndim == 1:
            comps.append(arr)
            meta.append((name, 1, arr.dtype))
        else:
            comps.extend(arr[:, a] for a in range(arr.shape[1]))
            meta.append((name, arr.shape[1], arr.dtype))

    out = jax.lax.sort((key,) + tuple(comps), num_keys=1, is_stable=True)
    key_s, comps_s = out[0], list(out[1:])

    counts = jnp.zeros(C + 1, dtype=jnp.int32).at[key_s].add(1)
    starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                              jnp.cumsum(counts)[:-1].astype(jnp.int32)])
    rank = jnp.arange(n, dtype=jnp.int32) - starts[key_s]
    slot = jnp.where((rank < cap) & (key_s < C),
                     rank * (C + 1) + key_s, slots)
    overflow = jnp.sum((rank >= cap) & (key_s < C)).astype(jnp.int32)

    active = (jnp.zeros(slots, jnp.bool_)
              .at[slot].set(jnp.ones((n,), jnp.bool_), mode="drop"))
    moved, col = {}, 0
    for name, ncomp, dtype in meta:
        if ncomp == 1:
            upd = comps_s[col]
        else:
            upd = jnp.stack(comps_s[col:col + ncomp], axis=-1)
        moved[name] = (jnp.zeros((slots,) + upd.shape[1:], dtype)
                       .at[slot].set(upd, mode="drop"))
        col += ncomp
    return moved, active, overflow


# Stencil-compaction lowering dispatch (round 5, TPU-measured).  The
# elementwise source-slot-loop placement is the DEFAULT: the einsum form
# (a) runs the selection contraction on the MXU at precision=HIGHEST —
# ~80 ms per rescatter even at an 11.7k-slot dam grid, 4.86 vs 0.90
# ms/step on configs that rescatter every ~20 steps (scripts/r5_dam_ab)
# — and (b) makes XLA materialize transposed [*grid, F, cap] operand
# copies whose minor (F, cap) dims tile-pad ~13×: 3 × 2.62 GB HLO temps
# at the 3.25M witch3d grid → HBM OOM.  The k-loop is bit-identical
# (gated in test_neighbors) and VPU-only; its one cost is HLO size
# (~len(stencil)·cap elementwise ops), so ABOVE the unroll bound the
# einsum is used where its padded temps fit (collapse3d: 27·40 = 1080
# unroll but a tiny grid), and the k-loop is kept regardless when they
# do not.
_COMPACT_KLOOP_MAX_UNROLL = 512
_COMPACT_EINSUM_TEMP_MAX = 1536 * 2**20


def _compact_use_einsum(stencil_n: int, grid, n_comp: int,
                        cap: int) -> bool:
    if stencil_n * cap <= _COMPACT_KLOOP_MAX_UNROLL:
        return False
    cells = 1
    for g in grid:
        cells *= g
    padded = (-(-n_comp // 8) * 8) * (-(-cap // 128) * 128)
    return cells * padded * 4 <= _COMPACT_EINSUM_TEMP_MAX


def _is_bookkeeping(name: str) -> bool:
    """SLOT-bound accumulator fields, by convention "_"-prefixed (e.g. the
    spawn-drop counter ``_spawn_drops``): carried in the state pytree for
    jit/scan plumbing but bound to slots, not particles — every rescatter
    flavor leaves them untouched in place (neither moved nor zeroed).
    ``_xref`` is NOT bookkeeping: it is particle data with its own
    dedicated rescatter handling."""
    return name.startswith("_") and name != "_xref"


@dataclasses.dataclass(frozen=True)
class NeighborEngine:
    """Static engine configuration (hashable → usable as a jit static arg).

    ``h`` is the system interaction radius = cell size; ``phase``/``lims``
    are the reference's key_phase/key_lim (src/structs.jl:66-68).
    """
    dim: int
    h: float
    phase: tuple          # int per axis
    lims: tuple           # cells per axis
    cap: int              # bucket capacity
    dtype: Any = jnp.float32
    mins: tuple = ()      # domain box, per axis (containment screen)
    maxs: tuple = ()
    # pair-sweep implementation: "cell" = dense [ncells, cap, cap] blocks with
    # pad+slice stencil shifts (zero gathers in the pair loop — the fast TPU
    # path); "gather" = per-particle candidate gathers (reference-shaped,
    # kept for cross-checking)
    pair_mode: str = "cell"
    # state layout: "flat" = particles in arbitrary row order, sorted at each
    # rebuild; "bucket" = state rows ARE bucket slots (slot = rank*(C+1)+key,
    # transposed so cells ride the vector lanes) — the zero-gather/zero-scatter
    # hot path. With a positive ``skin``, cells are (1+skin)·h wide and the
    # expensive rescatter runs only when some particle has drifted more than
    # skin·h/2 since the last one (a lax.cond inside rebuild); the r ≤ h pair
    # cutoff is unaffected. Out-of-domain removal is deferred to the next
    # rescatter (the reference removes every step, src/core.jl:63-81).
    layout: str = "flat"
    skin: float = 0.0
    # per-axis cell widths; () -> isotropic ((1+skin)·h per axis). Setting
    # these to exact multiples of the particle-lattice pitch removes
    # occupancy aliasing (cells catching an extra lattice row/plane), which
    # is the ONLY lever on pair-sweep cost: work per particle is provably
    # stencil·cap_pad·kmax/o_avg, invariant to cell size except through the
    # cap/kmax quantization that aliasing inflates. Each width must be ≥ h
    # (pair cutoff r ≤ h must stay inside the ±1-cell stencil).
    cells: tuple = ()
    # Fields the bucket-layout rescatter must MOVE; () = all of them (safe
    # default). A scheme whose step recomputes every other field after
    # ``rebuild`` before reading it (e.g. summation-density WCSPH: rho, P,
    # rho_p, ... are all derived post-rebuild, and Dv is zero at rebuild
    # time) can shrink this to the irreducible state (x, v, h, m, type) —
    # every moved component rides the variadic sort (~1 ms per payload at
    # 2M slots) plus a share of one wide scatter, so fewer fields ≈
    # proportionally cheaper rescatters. Non-moved fields are zeroed —
    # EXCEPT bookkeeping fields (name starting with "_", e.g. the spawn-
    # drop accumulator "_spawn_drops"), which are SLOT-bound rather than
    # particle-bound: rescatters leave them untouched in place ("_xref"
    # keeps its own dedicated handling).
    persistent: tuple = ()
    # Bucket rescatter implementation. "stencil" (default): between
    # rescatters every particle has drifted ≤ skin_slack/2 + one step ≪ one
    # cell, so its new cell is within ±1 of its current one and re-placement
    # is a windowed compaction over the 9/27 neighbor blocks — pure shifted
    # elementwise ops, no sort and no random gather/scatter (freeze() places
    # initial rows in their slots host-side, so the locality invariant holds
    # from step 0). Particles that nonetheless land farther away (only
    # possible if rows are teleported, e.g. spawn pools writing arbitrary
    # inactive slots) are DROPPED and counted in Neighbors.overflow — models
    # that spawn under the bucket layout must set "sort" (the variadic
    # sort-payload move, valid for any row placement). The compaction is
    # vectorized (rank = cumsum over source slots, placement = one one-hot
    # einsum per stencil offset — round 4; the earlier unrolled
    # stencil·cap graph compiled >30 min past ~512), so compile cost is
    # ~len(stencil) ops: 4.8 s CPU even at collapse3d's 27·40=1080.
    # "stencil" still degrades to "sort" past _STENCIL_COST_MAX — beyond
    # it the [cap, cap, cells] one-hot temporaries start to dominate HBM
    # traffic and the sort move's fixed cost wins.
    rescatter_mode: str = "stencil"

    _STENCIL_COST_MAX = 2048  # max len(stencil)*cap for the compaction

    @property
    def effective_rescatter_mode(self) -> str:
        if (self.rescatter_mode == "stencil"
                and len(self.stencil) * self.cap > self._STENCIL_COST_MAX):
            return "sort"
        return self.rescatter_mode

    # ------------------------------------------------------------- creation
    @staticmethod
    def create(box, h: float, dim: int, positions: np.ndarray | None = None,
               cap: int | None = None, dtype=jnp.float32,
               pair_mode: str = "auto", layout: str = "flat",
               skin: float = 0.0, cells: tuple | None = None,
               persistent: tuple = (),
               rescatter_mode: str = "stencil") -> "NeighborEngine":
        """Build an engine for domain ``box`` and interaction radius h.

        Key arithmetic matches reference src/structs.jl:66-68 (with per-axis
        cell size L_a, default (1+skin)·h): phase_a = floor(min_a/L_a),
        lim_a = floor(max_a/L_a) − phase_a + 1.
        """
        if cells is None or len(cells) == 0:
            cells = (h * (1.0 + skin),) * dim
        cells = tuple(float(c) for c in cells)
        assert len(cells) == dim
        assert all(c >= h for c in cells), (cells, h)
        L = np.asarray(cells, dtype=np.float64)
        mins = np.asarray(box.mins[:dim], dtype=np.float64)
        maxs = np.asarray(box.maxs[:dim], dtype=np.float64)
        phase = np.floor(mins / L).astype(np.int64)
        lims = (np.floor(maxs / L).astype(np.int64) - phase + 1)
        if layout == "bucket":
            # round grid dims to TPU-tile-friendly multiples — XLA codegen
            # for the pad/slice stencil shifts is highly shape-sensitive
            # (observed 14x cliffs); extra cells stay empty and masked
            lims = lims.copy()
            lims[0] = -(-lims[0] // 128) * 128
            for a in range(1, dim):
                lims[a] = -(-lims[a] // 8) * 8
        if cap is None:
            cap = NeighborEngine._estimate_cap(positions, L, phase, lims, dim)
        if pair_mode == "auto":
            # dense cell blocks pay off only when the grid is well occupied;
            # sparse clouds in a large domain are better served by gathers
            num_cells = int(np.prod(lims))
            n = 0 if positions is None else len(positions)
            pair_mode = "cell" if num_cells * cap <= 4 * max(n, 1) else "gather"
        return NeighborEngine(dim=dim, h=float(h), phase=tuple(int(p) for p in phase),
                              lims=tuple(int(l) for l in lims), cap=int(cap),
                              dtype=dtype, mins=tuple(mins), maxs=tuple(maxs),
                              pair_mode=pair_mode, layout=layout,
                              skin=float(skin), cells=cells,
                              persistent=tuple(persistent),
                              rescatter_mode=rescatter_mode)

    @property
    def cell_size(self) -> tuple:
        """Per-axis cell widths (length-dim tuple). Broadcasts against
        [N, dim] position arrays; x-slab code uses cell_size[0]."""
        if self.cells:
            return self.cells
        return (self.h * (1.0 + self.skin),) * self.dim

    @property
    def skin_slack(self) -> float:
        """Drift budget before a rescatter is needed: the narrowest cell's
        margin over the pair cutoff h (= skin·h for isotropic cells)."""
        return min(self.cell_size) - self.h

    @property
    def slots(self) -> int:
        """State capacity in bucket layout: cap rows × (num_cells+1) columns."""
        return self.cap * (self.num_cells + 1)

    @staticmethod
    def _estimate_cap(positions, L, phase, lims, dim) -> int:
        """Max bucket occupancy from POSITIONS binned at the per-axis cell
        widths ``L`` ([dim] array), plus compression headroom."""
        if positions is None or len(positions) == 0:
            return 16
        pos = np.asarray(positions)[:, :dim]
        pos = pos[np.isfinite(pos).all(axis=1)]  # screened rows (NaN/Inf)
        # would otherwise cast to INT64_MIN, clip into bin 0 and inflate occ
        if len(pos) == 0:
            return 16
        ci = np.floor(pos / L).astype(np.int64) - phase
        ci = np.clip(ci, 0, np.asarray(lims) - 1)
        key = ci[:, 0]
        stride = lims[0]
        for a in range(1, dim):
            key = key + stride * ci[:, a]
            stride *= lims[a]
        occ = np.bincount(key).max()
        # Headroom for compression during the run, rounded to the f32
        # sublane tile (8): the VPU processes [8, 128] tiles, so a 12-row
        # block costs exactly what a 16-row block does — only multiples of 8
        # are meaningful cap values on TPU (Mosaic also rejects unaligned
        # row slices in the Pallas pair kernels). Keep cap TIGHT: the
        # bucket-layout state is cap·(C+1) rows, so every spare 8-row tile
        # costs real time everywhere (measured 2.2x end-to-end at 1M going
        # 16→8). Overflow is surfaced (Neighbors.overflow), not silent.
        cap = int(occ) + max(1, int(occ) // 4)
        return -(-cap // 8) * 8

    # ------------------------------------------------------------ derived
    @property
    def num_cells(self) -> int:
        n = 1
        for l in self.lims:
            n *= l
        return n

    @property
    def stencil(self) -> list:
        """9 (2-D) / 27 (3-D) relative cell offsets (reference key_diff,
        src/structs.jl:70-82)."""
        if self.dim == 2:
            return [(di, dj) for dj in (-1, 0, 1) for di in (-1, 0, 1)]
        return [(di, dj, dk) for dk in (-1, 0, 1) for dj in (-1, 0, 1)
                for di in (-1, 0, 1)]

    def flat_key(self, cell: jnp.ndarray) -> jnp.ndarray:
        """Flat cell index from per-axis coords [..., dim]."""
        key = cell[..., 0]
        stride = self.lims[0]
        for a in range(1, self.dim):
            key = key + stride * cell[..., a]
            stride *= self.lims[a]
        return key

    # ------------------------------------------------------------- rebuild
    def rebuild(self, state: ParticleState) -> tuple[ParticleState, Neighbors]:
        """Refresh the neighbor structure. Jit-safe.

        flat layout: screen + stable sort into cell order + bucket table.
        bucket layout: rescatter into slot positions only if some particle
        drifted past the skin budget (lax.cond), then derive the implicit
        neighbor structure from the slot layout itself.
        """
        if self.layout == "bucket":
            return self._rebuild_bucket(state)
        return self._rebuild_flat(state)

    def _screen_and_key(self, state: ParticleState):
        x = state.fields["x"]
        mins = jnp.asarray(self.mins, dtype=x.dtype)
        maxs = jnp.asarray(self.maxs, dtype=x.dtype)
        finite = jnp.all(jnp.isfinite(x), axis=-1)
        inside = jnp.all((x >= mins) & (x <= maxs), axis=-1)
        active = state.active & jnp.where(finite, inside, False)

        xsafe = jnp.where(finite[:, None], x, 0.0)
        L = jnp.asarray(self.cell_size, dtype=x.dtype)
        cell = (jnp.floor(xsafe / L).astype(jnp.int32)
                - jnp.asarray(self.phase, dtype=jnp.int32))
        cell = jnp.clip(cell, 0, jnp.asarray(self.lims, dtype=jnp.int32) - 1)
        key = jnp.where(active, self.flat_key(cell), self.num_cells).astype(jnp.int32)
        return active, cell, key

    def _rebuild_flat(self, state: ParticleState) -> tuple[ParticleState, Neighbors]:
        N = state.fields["x"].shape[0]
        active, cell, key = self._screen_and_key(state)
        order = jnp.argsort(key, stable=True)
        fields = {name: arr[order] for name, arr in state.fields.items()}
        sorted_state = ParticleState(fields=fields, active=active[order])
        key_s = key[order]
        cell_s = cell[order]

        counts = jnp.zeros(self.num_cells + 1, dtype=jnp.int32).at[key_s].add(1)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        rank = jnp.arange(N, dtype=jnp.int32) - starts[key_s]
        slot = key_s * self.cap + rank
        slot = jnp.where(rank < self.cap, slot, (self.num_cells + 1) * self.cap)
        bucket = (jnp.zeros((self.num_cells + 1) * self.cap, dtype=jnp.int32)
                  .at[slot].set(jnp.arange(N, dtype=jnp.int32), mode="drop")
                  .reshape(self.num_cells + 1, self.cap))
        overflow = jnp.maximum(jnp.max(counts[: self.num_cells]) - self.cap, 0)
        nbrs = Neighbors(cell=cell_s, key=key_s, rank=rank, counts=counts,
                         starts=starts, bucket=bucket, overflow=overflow)
        return sorted_state, nbrs

    # ------------------------------------------------ bucket-layout rebuild
    def _full_rescatter(self, state: ParticleState):
        """Re-place every active particle at its slot rank*(C+1)+key.
        Inactive rows are dropped (reference removal semantics); rows whose
        cell overflows ``cap`` are also dropped, but COUNTED and surfaced
        (reference removal is observable — particle count printed per frame,
        sph_jl/examples/cylinder.jl:202). ``_xref`` is reset to the new
        positions. Returns (new_state, n_dropped_by_overflow)."""
        C, cap = self.num_cells, self.cap
        active, cell, key = self._screen_and_key(state)
        move = {name: arr for name, arr in state.fields.items()
                if name != "_xref" and not _is_bookkeeping(name)
                and (not self.persistent or name in self.persistent)}
        moved, new_active, overflow = sorted_slot_scatter(
            key, move, C, cap, self.slots)
        fields = {}
        for name, arr in state.fields.items():
            if name == "_xref":
                continue
            fields[name] = (arr if _is_bookkeeping(name)
                            else moved.get(name, jnp.zeros_like(arr)))
        fields["_xref"] = fields["x"]
        return ParticleState(fields=fields, active=new_active), overflow

    def _stencil_rescatter(self, state: ParticleState):
        """1-cell-local rescatter: windowed compaction over the 9/27
        neighbor blocks (see ``rescatter_mode``). For every cell c and every
        stencil offset o (offset-major, then source slot — deterministic),
        candidates are the slots of cell c+o whose NEW key equals c; they
        are packed into c's slots in scan order via a one-hot rank match.
        All data movement is pad+slice stencil shifts and elementwise
        selects — measured ~10-40x cheaper than the sort-payload move.
        Drops (cap overflow + any particle farther than one cell) are
        counted and surfaced. Returns (new_state, n_dropped)."""
        active, cell, key = self._screen_and_key(state)
        return self._stencil_compact(state, jnp.where(active, key,
                                                      self.num_cells))

    def _stencil_compact(self, state: ParticleState, key,
                         count_cells=None):
        """Compaction core of the stencil rescatter. ``key`` is the
        per-slot destination cell ([slots] int32; ``num_cells`` = remove),
        computed by the caller — the single-device rescatter bins with
        ``_screen_and_key``; the sharded engine (parallel/bucket.py) bins
        with global-parity slab-offset keys so ghost-column mirrors compact
        into owned cells (migration). ``count_cells`` (optional [num_cells]
        bool) restricts the drop accounting (cap overflow + >1-cell
        teleports) to the cells this device owns — placement itself is
        unrestricted (ghost placements are overwritten by the post-compact
        ghost refresh). Returns (new_state, n_dropped)."""
        C, cap = self.num_cells, self.cap
        dim = self.dim
        grid = tuple(reversed(self.lims))  # [(nz,) ny, nx], x minor

        def gview(flat):
            return self.resident(flat)[:, :C].reshape((cap,) + grid)

        def pad1(a, fill):
            return jnp.pad(a, ((0, 0),) + ((1, 1),) * dim,
                           constant_values=fill)

        def sl(padded, off, lead=1):
            # shifted[c] = a[c + off]; off = (dx, dy(, dz)), grid axes are
            # reversed (x minor); `lead` = number of unshifted leading axes
            idxs = (slice(None),) * lead
            for ax in range(dim):           # grid axis ax: z/y/x for dim 3
                o = off[dim - 1 - ax]
                n_ax = grid[ax]
                idxs += (slice(1 + o, 1 + o + n_ax),)
            return padded[idxs]

        keyg = pad1(gview(key.astype(jnp.int32)), C)
        idx = jnp.arange(C, dtype=jnp.int32).reshape(grid)

        dt = state.fields["x"].dtype
        names = [n for n in state.fields
                 if n != "_xref" and not _is_bookkeeping(n)
                 and (not self.persistent or n in self.persistent)]
        comps = []  # (name, comp_axis or None, padded [cap, grid+2])
        for n in names:
            arr = state.fields[n]
            if arr.ndim == 1:
                comps.append((n, None, pad1(gview(arr), 0)))
            else:
                for a in range(arr.shape[1]):
                    comps.append((n, a, pad1(gview(arr[:, a]), 0)))

        # Vectorized packing (round 4; replaces an unrolled stencil·cap
        # slot loop whose 216-step sequential `cnt` chain made XLA compile
        # ~10x longer at flow caps — terrain cap 24 measured 1953 s).
        # Packing order is unchanged (offset-major, then source slot):
        # rank of source slot k in its destination cell = cells packed by
        # earlier offsets (cnt) + exclusive cumsum over k within this
        # offset; placement is one one-hot contraction over k per offset.
        vals = jnp.stack([c[2] for c in comps])     # [F, cap, grid+2]
        cnt = jnp.zeros(grid, jnp.int32)
        iota_k = jnp.arange(cap, dtype=jnp.int32).reshape(
            (cap,) + (1,) * dim)
        outs_fs = jnp.zeros((len(comps), cap) + grid, dt)
        for off in self.stencil:
            nk = sl(keyg, off)                      # [cap, *grid]
            member = nk == idx[None]
            sv = sl(vals, off, lead=2)              # [F, cap, *grid]
            mi = member.astype(jnp.int32)
            rank = cnt[None] + jnp.cumsum(mi, axis=0) - mi
            # One-hot placement, two bit-identical lowerings — see the
            # dispatch comment at _compact_use_einsum. The einsum branch
            # needs precision=HIGHEST (TPU einsum defaults to bf16 MXU
            # multiplies, which would round carried positions to ~8
            # mantissa bits; the selection has ≤1 nonzero term per
            # output, so f32 multiply is bit-exact).
            if _compact_use_einsum(len(self.stencil), grid, len(comps),
                                   cap):
                oh = ((iota_k[:, None] == rank[None])
                      & member[None]).astype(dt)
                outs_fs = outs_fs + jnp.einsum(
                    "sk...,fk...->fs...", oh, sv,
                    precision=jax.lax.Precision.HIGHEST)
            else:
                contrib = jnp.zeros_like(outs_fs)
                for k in range(cap):
                    sel = ((iota_k == rank[k][None])
                           & member[k][None]).astype(dt)  # [cap_s, *grid]
                    contrib = contrib + sel[None] * sv[:, k][:, None]
                outs_fs = outs_fs + contrib
            cnt = cnt + jnp.sum(mi, axis=0)
        outs = list(outs_fs)

        placed = jnp.minimum(cnt, cap)
        if count_cells is None:
            dropped = (jnp.sum(cnt - placed)
                       + jnp.sum(key < C) - jnp.sum(cnt)).astype(jnp.int32)
        else:
            # overflow + teleports, counted only for cells I own (the
            # neighbor accounts for its own copies of shared-band rows)
            w = count_cells.reshape(grid).astype(jnp.int32)
            keyed_owned = ((key < C)
                           & jnp.take(count_cells,
                                      jnp.clip(key, 0, C - 1)))
            dropped = (jnp.sum((cnt - placed) * w)
                       + jnp.sum(keyed_owned)
                       - jnp.sum(cnt * w)).astype(jnp.int32)
        act_g = iota_k < placed[None]               # [cap, *grid]

        def to_flat(g):
            flat = g.reshape(cap, C)
            return jnp.pad(flat, ((0, 0), (0, 1))).reshape(cap * (C + 1))

        fields = {}
        i = 0
        for n in names:
            arr = state.fields[n]
            if arr.ndim == 1:
                fields[n] = to_flat(outs[i])
                i += 1
            else:
                cols = [to_flat(outs[i + a]) for a in range(arr.shape[1])]
                fields[n] = jnp.stack(cols, axis=-1)
                i += len(cols)
        for n, arr in state.fields.items():
            if n not in fields and n != "_xref":
                fields[n] = arr if _is_bookkeeping(n) else jnp.zeros_like(arr)
        fields["_xref"] = fields["x"]
        new_active = to_flat(act_g.astype(jnp.int32)) > 0
        return ParticleState(fields=fields, active=new_active), dropped

    def _implicit_consts(self):
        """Static neighbor-structure components of the bucket layout —
        host-cached numpy, embedded as XLA constants at trace time."""
        import functools
        return _implicit_consts_cached(self.lims, self.cap, self.dim)

    def _rebuild_bucket(self, state: ParticleState) -> tuple[ParticleState, Neighbors]:
        C, cap = self.num_cells, self.cap
        x = state.fields["x"]
        d2 = jnp.sum((x - state.fields["_xref"]) ** 2, axis=-1)
        d2 = jnp.nan_to_num(jnp.where(state.active, d2, 0.0), nan=jnp.inf,
                            posinf=jnp.inf)
        budget = (0.5 * self.skin_slack) ** 2
        need = jnp.max(d2) > budget
        resc = (self._stencil_rescatter
                if self.effective_rescatter_mode == "stencil"
                else self._full_rescatter)
        state, overflow = jax.lax.cond(
            need, resc,
            lambda s: (s, jnp.zeros((), jnp.int32)), state)
        if "_rescatter_count" in state.fields:
            # opt-in cadence observable (long-run soak, VERDICT r4 #8):
            # states carrying this bookkeeping field get one count per
            # drift-triggered rescatter, summable per frame host-side
            rc = state.fields["_rescatter_count"]
            state = state.replace(
                _rescatter_count=rc.at[0].add(need.astype(rc.dtype)))

        # implicit neighbor structure: the layout IS the cell assignment;
        # everything except counts/starts is static
        key_np, rank_np, cell_np, bucket_np = self._implicit_consts()
        key = jnp.asarray(key_np)
        rank = jnp.asarray(rank_np)
        cellc = jnp.asarray(cell_np)
        bucket = jnp.asarray(bucket_np)
        counts = jnp.sum(state.active.reshape(cap, C + 1), axis=0).astype(jnp.int32)
        starts = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                  jnp.cumsum(counts)[:-1].astype(jnp.int32)])
        nbrs = Neighbors(cell=cellc, key=key, rank=rank, counts=counts,
                         starts=starts, bucket=bucket, overflow=overflow)
        return state, nbrs

    def resident(self, arr: jnp.ndarray) -> jnp.ndarray:
        """View a bucket-layout flat field [slots(, d)] as [cap, C+1(, d)]."""
        return arr.reshape((self.cap, self.num_cells + 1) + arr.shape[1:])

    def pad_resident(self, B: jnp.ndarray) -> jnp.ndarray:
        """Zero-pad the cell grid of a resident field once; all 9/27 stencil
        shifts are then slices of this (one materialized pad per field per
        sweep instead of one shifted copy per offset)."""
        cap = B.shape[0]
        rest = B.shape[2:]
        if self.dim == 2:
            nx, ny = self.lims
            G = B[:, : nx * ny].reshape((cap, ny, nx) + rest)
            pad = ((0, 0), (1, 1), (1, 1)) + ((0, 0),) * len(rest)
        else:
            nx, ny, nz = self.lims
            G = B[:, : nx * ny * nz].reshape((cap, nz, ny, nx) + rest)
            pad = ((0, 0), (1, 1), (1, 1), (1, 1)) + ((0, 0),) * len(rest)
        return jnp.pad(G, pad)

    def slice_resident(self, P: jnp.ndarray, offset: tuple) -> jnp.ndarray:
        """Stencil view of a pad_resident array: out[:, c] = B[:, c+offset]."""
        cap = P.shape[0]
        if self.dim == 2:
            di, dj = offset
            nx, ny = self.lims
            out = P[:, 1 + dj: 1 + dj + ny, 1 + di: 1 + di + nx]
            return out.reshape((cap, nx * ny) + P.shape[3:])
        di, dj, dk = offset
        nx, ny, nz = self.lims
        out = P[:, 1 + dk: 1 + dk + nz, 1 + dj: 1 + dj + ny,
                1 + di: 1 + di + nx]
        return out.reshape((cap, nx * ny * nz) + P.shape[4:])

    def shift_resident(self, B: jnp.ndarray, offset: tuple) -> jnp.ndarray:
        """Stencil shift for resident layout: B [cap, C+1, ...] ->
        [cap, C, ...] where out[:, c] = B[:, c+offset] (zeros at grid edges).
        Pure pad+slice along the trailing cell axes."""
        return self.slice_resident(self.pad_resident(B), offset)

    # ------------------------------------------------- cell-dense helpers
    def bucketize(self, nbrs: Neighbors, arr: jnp.ndarray) -> jnp.ndarray:
        """Flat [N, ...] field → dense bucket tensor [num_cells+1, cap, ...]
        (slot-padded with row 0's data; pair validity comes from occupancy)."""
        return arr[nbrs.bucket]

    def occupancy(self, nbrs: Neighbors) -> jnp.ndarray:
        """[num_cells+1, cap] bool: slot k of cell c holds a particle."""
        return (jnp.arange(self.cap, dtype=jnp.int32)[None, :]
                < nbrs.counts[:, None])

    def shift_cells(self, B: jnp.ndarray, offset: tuple) -> jnp.ndarray:
        """Bring each cell's stencil-neighbor block to the cell's own slot:
        out[c] = B[c + offset] with zero padding at grid edges. Pure pad+slice
        (no gather) — the zero-gather heart of the cell-dense pair path."""
        rest = B.shape[1:]
        if self.dim == 2:
            di, dj = offset
            nx, ny = self.lims
            G = B[: nx * ny].reshape((ny, nx) + rest)
            pad = ((1, 1), (1, 1)) + ((0, 0),) * len(rest)
            P = jnp.pad(G, pad)
            out = P[1 + dj: 1 + dj + ny, 1 + di: 1 + di + nx]
            return out.reshape((nx * ny,) + rest)
        di, dj, dk = offset
        nx, ny, nz = self.lims
        G = B[: nx * ny * nz].reshape((nz, ny, nx) + rest)
        pad = ((1, 1), (1, 1), (1, 1)) + ((0, 0),) * len(rest)
        P = jnp.pad(G, pad)
        out = P[1 + dk: 1 + dk + nz, 1 + dj: 1 + dj + ny, 1 + di: 1 + di + nx]
        return out.reshape((nx * ny * nz,) + rest)

    # ------------------------------------------------- stencil candidates
    def stencil_candidates(self, nbrs: Neighbors, offset: tuple):
        """For one stencil offset, per-particle candidate slots and validity.

        Returns (cand [N, cap] int32 slots, valid [N, cap] bool). Candidates
        come from the bucket row of the offset cell; validity covers bucket
        occupancy and stencil cells outside the grid.
        """
        ncell = nbrs.cell + jnp.asarray(offset, dtype=jnp.int32)
        lims = jnp.asarray(self.lims, dtype=jnp.int32)
        in_grid = jnp.all((ncell >= 0) & (ncell < lims), axis=-1)
        nkey = jnp.where(in_grid, self.flat_key(jnp.clip(ncell, 0, lims - 1)),
                         self.num_cells)
        cnt = jnp.where(in_grid, nbrs.counts[nkey], 0)
        cand = nbrs.bucket[nkey]  # [N, cap]
        valid = (jnp.arange(self.cap, dtype=jnp.int32)[None, :] < cnt[:, None])
        return cand, valid


import functools


@functools.lru_cache(maxsize=32)
def _implicit_consts_cached(lims: tuple, cap: int, dim: int):
    C = 1
    for l in lims:
        C *= l
    col = np.tile(np.arange(C + 1, dtype=np.int32), cap)
    rank = np.repeat(np.arange(cap, dtype=np.int32), C + 1)
    nx = lims[0]
    if dim == 2:
        cellc = np.stack([col % nx, col // nx], axis=-1)
    else:
        ny = lims[1]
        cellc = np.stack([col % nx, (col // nx) % ny, col // (nx * ny)],
                         axis=-1)
    bucket = (np.arange(cap, dtype=np.int32)[:, None] * (C + 1)
              + np.arange(C + 1, dtype=np.int32)[None, :]).T
    # cache NUMPY (converting to jnp inside a trace would cache tracers)
    return col, rank, cellc, bucket
