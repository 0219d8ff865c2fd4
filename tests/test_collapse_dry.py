"""Dam-break (collapse_dry) physics gates.

Fast gate: coarse-resolution short run — wavefront advances monotonically,
column height falls, energy drift stays bounded (the reference's qualitative
behavior, sph_jl/examples/collapse_dry.jl).

Slow gate (deselect with `-m "not slow"`): longer run compared against the
digitized Violeau dam-break wavefront curve
(tests/reference_data/dambreak_X_Violeau.csv), the validation built into the
reference example (collapse_dry.jl:233-247).
"""
import os

import numpy as np
import pytest

from sph_mountain_waves_tpu.models import collapse_dry as cd

DATA = os.path.join(os.path.dirname(__file__), "reference_data")


def test_collapse_dry_short():
    cfg = cd.Config(dr=0.06, t_end=0.4, n_frames=8)
    out = cd.run(cfg)
    X, H, E = out["X"], out["H"], out["E"]
    assert np.all(np.diff(X) > -1e-6)         # wavefront advances
    assert X[-1] > 1.5                        # has moved well past the column
    assert H[-1] < H[0]                       # column falls
    assert np.max(np.abs(E / E[0] - 1.0)) < 0.02
    # particle count conserved (walls keep everything in the domain)
    assert int(out["state"].n) == out["system"].n


@pytest.mark.slow
def test_collapse_dry_vs_violeau():
    # measured (r2, deterministic f64 CPU): max_err 0.0110, mean 0.0030 at
    # dr=0.02 — the few-percent regime of the reference's own plots
    # (collapse_dry.jl:233-247); gate with ~40% margin
    cfg = cd.Config(dr=0.02, t_end=1.2, n_frames=40)
    out = cd.run(cfg)
    ref = np.genfromtxt(os.path.join(DATA, "dambreak_X_Violeau.csv"),
                        delimiter=",", names=True)
    # compare at the digitized times within our run
    tmax = out["t"][-1]
    sel = ref["time"] <= tmax
    ours = np.interp(ref["time"][sel], out["t"], out["X"])
    err = np.abs(ours - ref["X"][sel]) / ref["X"][sel]
    assert np.max(err) < 0.016
    assert np.mean(err) < 0.005
