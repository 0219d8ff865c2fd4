"""Pallas TPU pair-sweep kernels for the resident bucket layout (2-D).

The XLA cell-dense path evaluates every (slot_p, slot_q) pair of the dense
cap×cap block — ~15% useful work under stratified occupancy (the atmosphere's
bottom rows dictate cap). These kernels walk the q-slot axis with a **dynamic
per-row trip count** (scalar-prefetched max occupancy over the row's stencil
band), skipping empty slots entirely, and stream one grid row per program:
the 3-row halo window of each field is DMA'd HBM→VMEM once and all 9 stencil
offsets are slices of it.

Layout contract (NeighborEngine layout="bucket"): a field is [cap, C+1] with
C = nx·ny flat row-major cells (slot = k·(C+1) + cy·nx + cx); a 3-row window
with ±1-column halo is therefore one contiguous span per row. Column overrun
at row edges wraps into the neighboring row exactly like the reference's
flat-key arithmetic (src/structs.jl:97-106) and is removed by the r ≤ h mask.

Used by the mountain-wave schemes when cfg.use_pallas=True; validated against
the XLA path in tests (interpret mode on CPU, real kernels on TPU).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:  # TPU-only module; interpret mode works anywhere
    from jax.experimental.pallas import tpu as pltpu
except Exception:  # pragma: no cover
    pltpu = None

__all__ = ["density_pass", "momentum_pass", "row_kmax"]


def row_kmax(engine, state):
    """(band_max, row_max): per-grid-row max bucket occupancy maxed over the
    ±1 stencil band (the q-slot trip bound) and for the row itself (the
    p-slot chunk bound). Each [ny] int32."""
    nx, ny = engine.lims
    C = engine.num_cells
    occ = engine.resident(state.active)[:, :C]          # [cap, C]
    per_cell = jnp.sum(occ, axis=0)                     # [C]
    per_row = jnp.max(per_cell.reshape(ny, nx), axis=1)  # [ny]
    padded = jnp.pad(per_row, (1, 1))
    band = jnp.maximum(jnp.maximum(padded[:-2], padded[1:-1]), padded[2:])
    return band.astype(jnp.int32), per_row.astype(jnp.int32)


HALO = 128  # DMA slices must be 128-lane aligned on TPU


def _pad_fields(engine, fields):
    """[cap, C+1] resident fields → [cap, C+640] with 128 leading zero
    columns (so window starts stay 128-aligned and in bounds) and trailing
    zeros covering the widest window of the last row."""
    out = []
    for f in fields:
        C1 = f.shape[1]
        trail = 640 - HALO - C1 % 128 if C1 % 128 else 640 - HALO
        out.append(jnp.pad(f, ((0, 0), (HALO, 511))))
    return out


def _make_pair_kernel(engine, n_in, n_out, pair_body, self_pair, name):
    """Build a pallas_call for one pair sweep.

    pair_body(p_fields, q_fields, r2, h_sys) -> list of [cap, nx] contribs
    where p_fields[i] is [cap, nx] (center row) and q_fields[i] is [cap? no —
    one q slot row] [nx] broadcastable.
    """
    nx, ny = engine.lims
    cap = engine.cap
    C = engine.num_cells
    h_sys = engine.h

    def kernel(kmax_ref, kmaxp_ref, *refs):
        in_refs = refs[:n_in]
        out_refs = refs[n_in:n_in + n_out]
        bufs = refs[n_in + n_out:n_in + n_out + 3 * n_in]  # [fi*3 + dj]
        accs_ref = refs[n_in + n_out + 3 * n_in:
                        n_in + n_out + 3 * n_in + n_out]
        sems = refs[-1]
        j = pl.program_id(0)

        # DMA the 3-row halo windows of every field: original flat columns
        # [row*nx - 128, row*nx + nx + 128) = padded [row*nx, row*nx+nx+256)
        W = nx + 2 * HALO
        for fi in range(n_in):
            for dj in range(3):
                row = jnp.clip(j + dj - 1, 0, ny - 1)
                start = pl.multiple_of(row * nx, 128)
                pltpu.make_async_copy(
                    in_refs[fi].at[:, pl.ds(start, W)],
                    bufs[fi * 3 + dj],
                    sems.at[fi, dj],
                ).start()
        for fi in range(n_in):
            for dj in range(3):
                pltpu.make_async_copy(
                    in_refs[fi].at[:, pl.ds(0, W)],  # shape-only handle
                    bufs[fi * 3 + dj],
                    sems.at[fi, dj],
                ).wait()

        # p-side center row (occ is field 0, x0 field 1, x1 field 2)
        p_all = [bufs[fi * 3 + 1][:, HALO:HALO + nx] for fi in range(n_in)]
        occ_p = p_all[0] > 0.5
        x0p, x1p = p_all[1], p_all[2]

        kmax = kmax_ref[j]
        kmaxp = kmaxp_ref[j]
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (cap, nx), 0)
        for oi in range(n_out):
            accs_ref[oi][:, :] = jnp.zeros((cap, nx), jnp.float32)

        # static unroll over q slots and 8-row p-slot chunks, both
        # runtime-predicated on the row's occupancy: empty slots and empty
        # p-chunks are skipped entirely (the stratified atmosphere makes
        # this a large work saving over the dense block)
        # NOTE: chunking the p axis (8-row blocks under a second pl.when)
        # was measured 2x SLOWER at 1M despite the skipped work — the extra
        # predicated regions defeat Mosaic's scheduling. Keep one chunk.
        p_chunks = [(0, cap)]
        for kq in range(cap):
            @pl.when(kq < kmax)
            def _(kq=kq):
                for dj in range(3):
                    rowvalid = jnp.logical_and(j + dj - 1 >= 0,
                                               j + dj - 1 < ny)
                    for di in range(3):
                        q_all = [bufs[fi * 3 + dj][kq,
                                 HALO - 1 + di:HALO - 1 + di + nx]
                                 for fi in range(n_in)]
                        occ_q = (q_all[0] > 0.5) & rowvalid
                        x0q, x1q = q_all[1], q_all[2]
                        for p0, plen in p_chunks:
                            @pl.when(jnp.logical_or(p0 == 0, p0 < kmaxp))
                            def _(p0=p0, plen=plen, q_all=q_all,
                                  occ_q=occ_q, x0q=x0q, x1q=x1q, kq=kq,
                                  dj=dj, di=di):
                                psl = slice(p0, p0 + plen)
                                pc_all = [a[psl] for a in p_all]
                                r2 = ((pc_all[1] - x0q[None, :]) ** 2
                                      + (pc_all[2] - x1q[None, :]) ** 2)
                                mask = ((pc_all[0] > 0.5) & occ_q[None, :]
                                        & (r2 <= h_sys * h_sys))
                                if dj == 1 and di == 1 and not self_pair:
                                    mask = mask & (row_ids[psl] != kq)
                                contribs = pair_body(pc_all, q_all, r2, mask)
                                for oi in range(n_out):
                                    accs_ref[oi][psl, :] += jnp.where(
                                        mask, contribs[oi], 0.0)

        for oi in range(n_out):
            out_refs[oi][:, :] = accs_ref[oi][:, :]

    return kernel


def _run_pair_kernel(engine, state, fields, pair_body, n_out, self_pair,
                     name, interpret=False):
    nx, ny = engine.lims
    cap = engine.cap
    C = engine.num_cells
    occf = engine.resident(state.active).astype(jnp.float32)
    ins = _pad_fields(engine, [occf] + fields)  # each [cap, C+2]
    n_in = len(ins)
    kmax, kmaxp = row_kmax(engine, state)

    kernel = _make_pair_kernel(engine, n_in, n_out, pair_body, self_pair, name)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(ny,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)] * n_in,
        out_specs=[pl.BlockSpec((cap, nx), lambda j, kmax, kmaxp: (0, j),
                                memory_space=pltpu.VMEM)] * n_out,
        scratch_shapes=[pltpu.VMEM((cap, nx + 256), jnp.float32)
                        for _ in range(3 * n_in)]
        + [pltpu.VMEM((cap, nx), jnp.float32) for _ in range(n_out)]
        + [pltpu.SemaphoreType.DMA((n_in, 3))],
    )
    outs = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((cap, ny * nx), jnp.float32)] * n_out,
        interpret=interpret,
    )(kmax, kmaxp, *ins)
    # back to [cap*(C+1)] flat with the trash column re-appended
    flat = []
    for o in outs:
        flat.append(jnp.pad(o, ((0, 0), (0, 1))).reshape(cap * (C + 1)))
    return flat


def weighted_w_pass(engine, state, cfg, weight, ker_h: str = "p",
                    interpret=False):
    """Σ weight_q · w(h, r) over the stencil — the shared shape of the
    kernel-summation passes:

    * density (compute_density!, wcsph_perturbed_witch.jl:226-228):
      weight = m, ker_h="p" (the gather kernel uses p's smoothing length)
    * Hopkins smoothed pressure root (compute_pressure!,
      hopkins_perturbed_witch.jl:205-208): weight = m·A^(1/γ), ker_h="sym"
      (symmetric h_ij = ½(hp+hq))

    ``weight`` is a per-particle [N] array; self term per cfg.self_density.
    """
    from ..kernels import wendland2
    f = state.fields
    x = f["x"]
    x0 = engine.resident(x[:, 0])
    x1 = engine.resident(x[:, 1])
    hB = engine.resident(f["h"])
    wB = engine.resident(weight)

    def body(p_all, q_all, r2, mask):
        hp = p_all[3]
        wq = q_all[4]
        if ker_h == "p":
            hk = hp
        else:
            hk = 0.5 * (hp + q_all[3][None, :])
        r = jnp.sqrt(jnp.maximum(r2, 0.0))
        w = wendland2(hk, jnp.where(mask, r, 2.0 * engine.h))
        return [wq[None, :] * w]

    (out,) = _run_pair_kernel(engine, state, [x0, x1, hB, wB], body, 1,
                              self_pair=cfg.self_density, name="wsum",
                              interpret=interpret)
    return out


def density_pass(engine, state, cfg, interpret=False):
    """Σ q.m · w(p.h, r) (scheme compute_density!,
    wcsph_perturbed_witch.jl:226-228), self term per cfg.self_density."""
    return weighted_w_pass(engine, state, cfg, state.fields["m"],
                           ker_h="p", interpret=interpret)


def pressure_pass(engine, state, cfg, interpret=False):
    """Hopkins smoothed-pressure root Σ q.m·q.A^{1/γ}·w(h_ij, r)
    (compute_pressure!, hopkins_perturbed_witch.jl:205-208)."""
    weight = state.fields["m"] * state.fields["A"] ** (1.0 / cfg.gamma)
    return weighted_w_pass(engine, state, cfg, weight, ker_h="sym",
                           interpret=interpret)


def momentum_pass(engine, state, cfg, interpret=False):
    """Perturbation-pressure + Monaghan-viscosity momentum sweep
    (balance_of_momentum!, wcsph_perturbed_witch.jl:261-286). Returns the
    (Dv0, Dv1) pair-sum contributions in flat slot order.

    Per-particle quantities (sound speed c = √(γP/ρ), pressure term P′/ρ²,
    floored ρ) are hoisted out of the kernel — the per-pair body carries a
    single sqrt."""
    from ..kernels import rDwendland2
    f = state.fields
    x = f["x"]
    gamma, alpha, beta, eps, floor = (cfg.gamma, cfg.alpha, cfg.beta,
                                      cfg.eps, cfg.rho_floor)
    rho_f = jnp.maximum(f["rho"], floor)
    Aterm = f["P_p"] / rho_f**2
    cs = jnp.sqrt(jnp.maximum(gamma * f["P"] / rho_f, 0.0))
    fields = [engine.resident(a) for a in (
        x[:, 0], x[:, 1], f["h"], f["m"], f["v"][:, 0], f["v"][:, 1],
        rho_f, Aterm, cs)]

    def body(p_all, q_all, r2, mask):
        (_, x0p, x1p, hp, _, v0p, v1p, rhop, Ap, cp) = p_all
        (_, x0q, x1q, hq, mq, v0q, v1q, rhoq, Aq, cq) = q_all
        x0q = x0q[None, :]; x1q = x1q[None, :]; hq = hq[None, :]
        mq = mq[None, :]; v0q = v0q[None, :]; v1q = v1q[None, :]
        rhoq = rhoq[None, :]; Aq = Aq[None, :]; cq = cq[None, :]

        r = jnp.sqrt(jnp.maximum(r2, 0.0))
        r_safe = jnp.where(mask, r, 2.0 * engine.h)
        h_ij = 0.5 * (hp + hq)
        ker = rDwendland2(h_ij, r_safe)
        dx0 = x0p - x0q
        dx1 = x1p - x1q
        dot = dx0 * (v0p - v0q) + dx1 * (v1p - v1q)

        coef = -mq * (Ap + Aq) * ker
        c_ij = 0.5 * (cp + cq)
        rho_ij = 0.5 * (rhop + rhoq)
        mu_ij = (h_ij * dot) / (r2 + eps * h_ij * h_ij)
        pi_ij = (-alpha * c_ij * mu_ij + beta * mu_ij**2) / rho_ij
        visc = jnp.where(dot < 0.0, -mq * pi_ij * ker, 0.0)

        s = coef + visc
        return [s * dx0, s * dx1]

    dv0, dv1 = _run_pair_kernel(engine, state, fields, body, 2,
                                self_pair=False, name="momentum",
                                interpret=interpret)
    return dv0, dv1
