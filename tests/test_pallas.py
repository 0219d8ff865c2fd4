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
    orig = pp._run_pair_kernel
    monkeypatch.setattr(pp, "_run_pair_kernel",
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


def test_hopkins_step_pallas_matches_xla(interpret_kernels):
    from sph_mountain_waves_tpu.models import hopkins_perturbed_witch as hp
    outs = {}
    for up in (False, True):
        cfg = WitchConfig(n_rows=10, dtype="float32", self_density=True,
                          layout="bucket", skin=0.2, use_pallas=up)
        sys_ = hp.make_system(cfg)
        state = sys_.freeze()
        step = jax.jit(hp.make_step(cfg, sys_.engine))
        for _ in range(8):
            state = step(state)
        outs[up] = [float(v) for v in velocity_diagnostics(state)]
    assert outs[True][0] == pytest.approx(outs[False][0], rel=1e-5)
    assert outs[True][1] == pytest.approx(outs[False][1], rel=1e-5)
