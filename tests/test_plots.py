"""Plot artifact channel: the reference's dam-break comparison figures and
the witch velocities panel (collapse_dry.jl:232-247,
wcsph_perturbed_witch.jl:393-405) render headless and land next to the
Paraview output."""
import os

import numpy as np

from sph_mountain_waves_tpu.utils.plots import (
    plot_cavity, plot_dambreak, plot_series, plot_velocities)


def test_plot_files_written(tmp_path):
    t = np.linspace(0.0, 3.0, 20)
    assert plot_dambreak(str(tmp_path), t, 1.0 + t, 1.0 - 0.2 * t)
    assert plot_velocities(str(tmp_path), t, 0.1 * t, 0.3 * t)
    assert plot_series(str(tmp_path / "e.pdf"), t, {"E": t ** 2},
                       ylabel="energy")
    s = np.linspace(0.0, 1.0, 30)
    assert plot_cavity(str(tmp_path), s, s - 0.5, 0.2 * np.sin(s), Re=100.0)
    for name in ("dambreak_X.pdf", "dambreak_H.pdf", "velocities.pdf",
                 "e.pdf", "ldc-x2vy.pdf", "ldc-y2vx.pdf"):
        p = tmp_path / name
        assert p.exists() and p.stat().st_size > 500, name


def test_plot_dambreak_overlays_reference_points(tmp_path):
    # the packaged digitized CSVs resolve by default (ref_dir=None)
    t = np.linspace(0.0, 3.0, 5)
    assert plot_dambreak(str(tmp_path), t, 1.0 + t, np.ones_like(t))
    assert (tmp_path / "dambreak_X.pdf").stat().st_size > 500
