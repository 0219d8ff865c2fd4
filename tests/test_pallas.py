"""Pallas pair-kernel gates (interpret mode on CPU; the same kernels compile
on TPU — benched at 4.7e7 particle-steps/s @1M on v5e)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import sph_mountain_waves_tpu.ops.pallas_pairs as pp
from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.witch_common import (
    WitchConfig, velocity_diagnostics,
)
from sph_mountain_waves_tpu.ops.apply import pair_sum
from sph_mountain_waves_tpu.kernels import wendland2


@pytest.fixture
def interpret_kernels(monkeypatch):
    orig = pp.make_pair_kernel_fn
    monkeypatch.setattr(pp, "make_pair_kernel_fn",
                        lambda *a, **k: orig(*a, **{**k, "interpret": True}))


def test_density_kernel_matches_xla(interpret_kernels):
    cfg = WitchConfig(n_rows=10, dtype="float32", self_density=True,
                      layout="bucket", skin=0.2)
    sys_ = w.make_system(cfg)
    state = sys_.freeze()
    eng = sys_.engine
    state, nbrs = jax.jit(eng.rebuild)(state)
    ref = np.asarray(pair_sum(eng, state, nbrs,
                              lambda p, q, r: q.m * wendland2(p.h, r),
                              self_interaction=True))
    got = np.asarray(pp.density_pass(eng, state, cfg))
    act = np.asarray(state.active)
    np.testing.assert_allclose(got[act], ref[act], rtol=1e-5, atol=1e-6)


def test_rows_per_program_stacking(interpret_kernels, monkeypatch):
    """rp grid rows stacked into one program ([cap, rp·nx] blocks) must be
    bit-identical to the one-row kernel — exercises the per-sub-row q-row
    validity masking and the grouped kmax trip bound."""
    cfg = WitchConfig(n_rows=10, dtype="float32", self_density=True,
                      layout="bucket", skin=0.2)
    sys_ = w.make_system(cfg)
    state = sys_.freeze()
    eng = sys_.engine
    state, nbrs = jax.jit(eng.rebuild)(state)
    outs = {}
    for rp in (1, 2, 4):
        assert eng.lims[1] % rp == 0, "test grid must divide evenly"
        monkeypatch.setattr(pp, "ROWS_PER_PROGRAM", rp)
        outs[rp] = np.asarray(pp.density_pass(eng, state, cfg))
    np.testing.assert_array_equal(outs[2], outs[1])
    np.testing.assert_array_equal(outs[4], outs[1])


def test_x_tiled_kernel_matches_untiled(interpret_kernels, monkeypatch):
    """Wide-grid x-tiling (round-5 ~2M-VMEM-cliff lever): column-chunk
    programs with per-chunk trip bounds (chunk_kmax) and per-stencil-row
    halo windows must be BIT-identical to the merged-span kernel — both
    for exact division (cx=128, ncx=3) and a PARTIAL last chunk (cx=256,
    ncx=2: the 128 overhang columns compute wrap garbage that the caller
    slices off)."""
    cfg = WitchConfig(n_rows=36, dtype="float32", self_density=True,
                      layout="bucket", skin=0.2)
    sys_ = w.make_system(cfg)
    state = sys_.freeze()
    eng = sys_.engine
    assert eng.lims[0] == 384, eng.lims   # wide enough for both cases
    state, nbrs = jax.jit(eng.rebuild)(state)
    ref = np.asarray(pp.density_pass(eng, state, cfg))
    for cx in (128, 256):
        monkeypatch.setattr(pp, "CHUNK_LANES", cx)
        got = np.asarray(pp.density_pass(eng, state, cfg))
        np.testing.assert_array_equal(got, ref)


def test_x_tiled_full_step_matches(interpret_kernels, monkeypatch):
    """Full Verlet steps (density + pressure + momentum passes, incl.
    dynamic-field kernels) under forced x-tiling with a partial chunk
    match the untiled run exactly."""
    outs = {}
    for cx in (0, 256):   # 0 = never tile
        monkeypatch.setattr(pp, "CHUNK_LANES", cx)
        cfg = WitchConfig(n_rows=36, dtype="float32", self_density=True,
                          layout="bucket", skin=0.2, use_pallas=True)
        sys_ = w.make_system(cfg)
        state = sys_.freeze()
        step = jax.jit(w.make_step(cfg, sys_.engine))
        for _ in range(4):
            state = step(state)
        outs[cx] = [float(v) for v in velocity_diagnostics(state)]
    assert outs[256] == outs[0]


@pytest.mark.heavy
def test_full_step_pallas_matches_xla(interpret_kernels):
    outs = {}
    for up in (False, True):
        cfg = WitchConfig(n_rows=10, dtype="float32", self_density=True,
                          layout="bucket", skin=0.2, use_pallas=up)
        sys_ = w.make_system(cfg)
        state = sys_.freeze()
        step = jax.jit(w.make_step(cfg, sys_.engine))
        for _ in range(8):
            state = step(state)
        outs[up] = [float(v) for v in velocity_diagnostics(state)]
    assert outs[True][0] == pytest.approx(outs[False][0], rel=1e-5)
    assert outs[True][1] == pytest.approx(outs[False][1], rel=1e-5)


@pytest.mark.smoke
def test_row_kmax_band():
    cfg = WitchConfig(n_rows=10, dtype="float32", layout="bucket", skin=0.2)
    sys_ = w.make_system(cfg)
    state = sys_.freeze()
    eng = sys_.engine
    state, _ = jax.jit(eng.rebuild)(state)
    band_max, row_max = (np.asarray(a) for a in pp.row_kmax(eng, state))
    occ = np.asarray(state.active).reshape(eng.cap, eng.num_cells + 1)
    nx, ny = eng.lims
    per_row = occ[:, :eng.num_cells].sum(0).reshape(ny, nx).max(axis=1)
    for j in range(ny):
        band = per_row[max(0, j - 1): j + 2].max()
        assert band_max[j] >= band  # q trip count covers the stencil band
        assert row_max[j] >= per_row[j]  # p chunk bound covers the row


def _scheme_pallas_vs_xla(module, make_cfg, n_steps=8, rel=1e-5):
    outs, counts = {}, {}
    for up in (False, True):
        cfg = make_cfg(up)
        sys_ = module.make_system(cfg)
        state = sys_.freeze()
        step = jax.jit(module.make_step(cfg, sys_.engine))
        for _ in range(n_steps):
            state = step(state)
        outs[up] = [float(v) for v in velocity_diagnostics(state)]
        counts[up] = int(np.asarray(state.active).sum())
    # a NaN anywhere in the pallas path shows up as rebuild's failure screen
    # silently dropping particles (caught a 0·inf edge-row poisoning once) —
    # the count must match exactly, not just the velocity diagnostics
    assert counts[True] == counts[False]
    assert np.all(np.isfinite(outs[True])) and np.all(np.isfinite(outs[False]))
    assert outs[True][0] == pytest.approx(outs[False][0], rel=rel)
    assert outs[True][1] == pytest.approx(outs[False][1], rel=rel)


@pytest.mark.heavy
def test_hopkins_step_pallas_matches_xla(interpret_kernels):
    from sph_mountain_waves_tpu.models import hopkins_perturbed_witch as hp
    _scheme_pallas_vs_xla(hp, lambda up: WitchConfig(
        n_rows=10, dtype="float32", self_density=True,
        layout="bucket", skin=0.2, use_pallas=up))


@pytest.mark.heavy
def test_full_hopkins_step_pallas_matches_xla(interpret_kernels):
    from sph_mountain_waves_tpu.models import full_hopkins_perturbed_witch as fh
    _scheme_pallas_vs_xla(fh, lambda up: WitchConfig(
        n_rows=10, dtype="float32", self_density=True,
        layout="bucket", skin=0.2, use_pallas=up))


@pytest.mark.heavy
def test_hopkins_total_step_pallas_matches_xla(interpret_kernels):
    from sph_mountain_waves_tpu.models import hopkins_total_witch as ht
    _scheme_pallas_vs_xla(ht, lambda up: WitchConfig(
        n_rows=10, dtype="float32", self_density=True,
        layout="bucket", skin=0.2, use_pallas=up))


@pytest.mark.heavy
def test_collapse_dry_pallas_matches_xla(interpret_kernels):
    from sph_mountain_waves_tpu.models import collapse_dry as cd
    outs = {}
    for up in (False, True):
        cfg = cd.Config(dr=0.08, dtype="float32", layout="bucket",
                        skin=0.2, use_pallas=up, t_end=0.1)
        sys_ = cd.make_system(cfg)
        state = sys_.freeze()
        step, init = cd.make_step(cfg, sys_.engine)
        state = init(state)
        step = jax.jit(step)
        for _ in range(6):
            state = step(state)
        v = np.asarray(state.fields["v"])[np.asarray(state.active)]
        outs[up] = [float(np.abs(v).mean()), float(np.abs(v).max())]
    assert np.all(np.isfinite(outs[True]))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4)


@pytest.mark.heavy
def test_collapse3d_pallas_matches_xla(interpret_kernels):
    # exercises the 27-offset 3-D kernel path
    from sph_mountain_waves_tpu.models import collapse3d as c3
    outs = {}
    for up in (False, True):
        cfg = c3.Config(dr=2.0e-2, dtype="float32", layout="bucket",
                        skin=0.2, use_pallas=up, t_end=0.05)
        sys_ = c3.make_system(cfg)
        state = sys_.freeze()
        step = jax.jit(c3.make_step(cfg, sys_.engine))
        for _ in range(6):
            state = step(state)
        v = np.asarray(state.fields["v"])[np.asarray(state.active)]
        outs[up] = [float(np.abs(v).mean()), float(np.abs(v).max())]
    assert np.all(np.isfinite(outs[True]))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4)


def test_isph_witch_pallas_matches_xla(interpret_kernels):
    """Fused div/L/λ+viscous sweep, per-CG-iteration matvec kernel, and the
    pressure-gradient kernel vs the XLA closures. The CG solve runs the
    Pallas matvec inside lax.while_loop; f32 roundoff walks the iterates
    apart slightly, so the gate is on the stepped-state diagnostics."""
    from sph_mountain_waves_tpu.models import isph_witch as iw
    outs, counts = {}, {}
    for up in (False, True):
        cfg = iw.ISPHWitchConfig(n_rows=10, dtype="float32",
                                 layout="bucket", skin=0.2, use_pallas=up)
        sys_ = iw.make_system(cfg)
        state = sys_.freeze()
        # kick the fluid so the Poisson RHS is nonzero and the CG runs a
        # real (convergent) solve — the exactly-static start has b = 0,
        # where P is the atol early-exit, not an iterative solution
        rng = np.random.default_rng(3)
        f = state.fields
        state = state.replace(v=jnp.where(
            (f["type"] == 0.0)[:, None],
            jnp.asarray(0.1 * rng.standard_normal(f["v"].shape),
                        dtype=f["v"].dtype), f["v"]))
        step = jax.jit(iw.make_step(cfg, sys_.engine))
        for _ in range(4):
            state = step(state)
        act = np.asarray(state.active)
        v = np.asarray(state.fields["v"])[act]
        P = np.asarray(state.fields["P"])[act]
        assert np.isfinite(P).all()
        outs[up] = ([float(np.abs(v).mean()), float(np.abs(v).max())],
                    float(np.abs(P).mean()))
        counts[up] = int(act.sum())
    assert counts[True] == counts[False]
    assert np.all(np.isfinite(outs[True][0]))
    # the f32 CG stalls at its precision floor (rel_res ~7e-3, verified
    # identical at maxiter 200 vs 2000) and the stall iterate is
    # path-dependent, so raw P only matches at the percent level; the
    # projected *velocities* — the physics output — must agree tightly
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=2e-3)
    assert outs[True][1] == pytest.approx(outs[False][1], rel=0.1)


def test_rayleigh_benard_pallas_matches_xla(interpret_kernels):
    # fused continuity+conduction pass and the shared dam-break force pass
    from sph_mountain_waves_tpu.models import rayleigh_benard as rb
    outs, counts = {}, {}
    for up in (False, True):
        cfg = rb.Config(n_rows=16, dtype="float32", layout="bucket",
                        skin=0.2, use_pallas=up)
        sys_ = rb.make_system(cfg)
        state = sys_.freeze()
        step = jax.jit(rb.make_step(cfg, sys_.engine))
        for _ in range(6):
            state = step(state)
        act = np.asarray(state.active)
        v = np.asarray(state.fields["v"])[act]
        T = np.asarray(state.fields["T"])[act]
        rho = np.asarray(state.fields["rho"])[act]
        outs[up] = [float(np.abs(v).mean()), float(np.abs(v).max()),
                    float(T.mean()), float(np.abs(rho - cfg.rho0).max())]
        counts[up] = int(act.sum())
    assert counts[True] == counts[False]
    assert np.all(np.isfinite(outs[True]))
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-4, atol=1e-8)


def test_pavelka_step_pallas_matches_xla(interpret_kernels):
    from sph_mountain_waves_tpu.models import pavelka_total_witch as pv
    _scheme_pallas_vs_xla(pv, lambda up: pv.PavelkaConfig(
        n_rows=10, dtype="float32", self_density=True,
        layout="bucket", skin=0.2, use_pallas=up))


@pytest.mark.parametrize("av", [0.0, 0.05], ids=["faithful", "av"])
def test_legacy_flow_step_pallas_matches_xla(interpret_kernels, av):
    """Terrain-baseline scheme (isothermal flow): the fused fixed-h0
    mass/force kernels against the apply_binary path, full steps incl.
    inflow recycling; mountain drag must agree too. av=0.05 wires the
    Monaghan artificial-viscosity branch (LegacyConfig.av_alpha) through
    both paths."""
    from sph_mountain_waves_tpu.models import legacy_witch as lw
    outs = {}
    for up in (False, True):
        cfg = lw.isothermal_flow_config(n_rows=16, dom_length=40e3,
                                        h_m=2000.0, a=6e3, dtype="float32",
                                        use_pallas=up, av_alpha=av)
        sys_ = lw.make_system(cfg)
        sys_.freeze_opts.update(capacity=int(sys_.n_built * 1.3),
                                rescatter_mode="sort", layout="bucket",
                                skin=0.15)
        state = sys_.freeze()
        step = jax.jit(lw.make_step(cfg, sys_.engine))
        for _ in range(8):
            state = step(state)
        F = lw.mountain_force(state)
        outs[up] = [float(v) for v in velocity_diagnostics(state)] + [
            float(F["drag"]), float(F["lift"])]
    assert np.all(np.isfinite(outs[True]))
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-4)


@pytest.mark.parametrize("av", [0.0, 0.05], ids=["faithful", "av"])
def test_iso_static_step_pallas_matches_xla(interpret_kernels, av):
    """Isothermal static scheme: the adaptive per-particle-h mass/force
    kernels against the apply_binary path; the evolving smoothing length
    (balance_of_smoothing integrates Dh from the Pallas Drho) must agree.
    av=0.05 wires the adaptive-h̄ Monaghan branch through both paths."""
    from sph_mountain_waves_tpu.models import legacy_witch as lw
    outs = {}
    for up in (False, True):
        cfg = lw.isothermal_static_config(n_rows=14, dom_length=40e3,
                                          h_m=2000.0, a=6e3, dtype="float32",
                                          use_pallas=up, av_alpha=av)
        sys_ = lw.make_system(cfg)
        sys_.freeze_opts.update(layout="bucket", skin=0.15)
        state = sys_.freeze()
        step = jax.jit(lw.make_step(cfg, sys_.engine))
        for _ in range(8):
            state = step(state)
        act = np.asarray(state.active)
        h = np.asarray(state.fields["h"])[act]
        rho = np.asarray(state.fields["rho"])[act]
        outs[up] = [float(v) for v in velocity_diagnostics(state)] + [
            float(h.mean()), float(np.abs(h - cfg.h0).max()),
            float(rho.mean())]
    assert np.all(np.isfinite(outs[True]))
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-4)


@pytest.mark.parametrize("flow,corrected", [
    (False, False), (True, False), (True, True),
], ids=["static", "flow", "flow_corrected"])
def test_adiabatic_step_pallas_matches_xla(interpret_kernels, flow, corrected):
    """Adiabatic legacy schemes: gated density + fused entropy+force
    kernels against the apply_binary path; entropy production must agree
    (it rides the fused sweep's both-FLUID gate). flow_corrected runs the
    corrected-physics bundle (the linear-drag configuration): ungated
    density with the FLUID|OUTFLOW p-side, Rayleigh sponge, consistent
    entropy — gates the Pallas path for quantitative drag runs."""
    from sph_mountain_waves_tpu.models import legacy_witch as lw
    factory = lw.adiabatic_flow_config if flow else lw.adiabatic_static_config
    extra = {}
    if corrected:
        extra = dict(true_rayleigh=True, consistent_entropy=True,
                     outflow_buffer=2 * 1.8 * (26e3 / 14), av_alpha=0.05)
    outs = {}
    for up in (False, True):
        cfg = factory(n_rows=14, dom_length=40e3, h_m=2000.0, a=6e3,
                      dtype="float32", use_pallas=up, **extra)
        sys_ = lw.make_system(cfg)
        sys_.freeze_opts.update(layout="bucket", skin=0.15)
        if flow:
            sys_.freeze_opts.update(capacity=int(sys_.n_built * 1.3),
                                    rescatter_mode="sort")
        state = sys_.freeze()
        step = jax.jit(lw.make_step(cfg, sys_.engine))
        for _ in range(8):
            state = step(state)
        act = np.asarray(state.active)
        S = np.asarray(state.fields["S"])[act]
        outs[up] = [float(v) for v in velocity_diagnostics(state)] + [
            float(S.sum()), float(np.abs(S).max())]
    assert np.all(np.isfinite(outs[True]))
    np.testing.assert_allclose(outs[True], outs[False], rtol=2e-4)


def test_fast_math_wiring_matches_exact(interpret_kernels):
    """cfg.fast_math swaps pair-body divides for pl.reciprocal(approx=True).
    Interpret mode evaluates that as an exact f32 reciprocal, so the only
    residual vs the plain-divide path is one extra rounding per
    multiply-by-inverse — trajectories must agree to f32 roundoff. Guards
    the wiring (field indices, recip placement) without TPU hardware; the
    hardware approximation error is measured on-device (BENCHMARKS.md)."""
    outs = {}
    for fm in (False, True):
        cfg = WitchConfig(n_rows=10, dtype="float32", self_density=True,
                          layout="bucket", skin=0.2, use_pallas=True,
                          fast_math=fm)
        sys_ = w.make_system(cfg)
        state = sys_.freeze()
        step = jax.jit(w.make_step(cfg, sys_.engine))
        for _ in range(5):
            state = step(state)
        outs[fm] = np.asarray(state.fields["x"])
    # positions are O(1e5) m; 1e-3 m absolute = f32 roundoff at that scale
    np.testing.assert_allclose(outs[True], outs[False], rtol=1e-6, atol=1e-3)
