"""Geometry/grid tests — Monte-Carlo-style area/volume checks matching the
reference suite (sph_jl/tests/test_geometry.jl): fill shapes with fine
lattices and compare counted area/volume to analytic values."""
import numpy as np
import pytest

from sph_mountain_waves_tpu import (
    Ball, Box, Circle, ClosedSpline, Cone, Ellipse, Ellipsoid, Grid, Polygon,
    Rectangle, RevolutionBody, Specification, Transform, Witch, covering,
)

RTOL_2D = 0.01
RTOL_3D = 0.03
N = 200
DA = 1.0 / (N * N)
DV = 1.0 / (N * N * N)


def area_of(grid, shape):
    return len(covering(grid, shape)) * DA


def vol_of(grid, shape):
    return len(covering(grid, shape)) * DV


def rotmat(t):
    return np.array([[np.cos(t), -np.sin(t), 0.0],
                     [np.sin(t), np.cos(t), 0.0],
                     [0.0, 0.0, 1.0]])


@pytest.mark.smoke
def test_areas():
    # mirrors sph_jl/tests/test_geometry.jl:59-107
    grid1 = Grid(1 / N, "square")
    grid2 = Grid(1 / N, "hexagonal")
    grid3 = Grid(1 / N, "vogel")

    s1 = Circle(0.0, 0.0, 1.0)
    assert area_of(grid1, s1) == pytest.approx(np.pi, rel=RTOL_2D)

    s2 = Rectangle(0.0, -1.0, 2.0, 5.0)
    assert area_of(grid2, s2) == pytest.approx(12.0, rel=RTOL_2D)

    s3 = Ellipse(0.0, 0.0, 4.0, 1.0)
    assert area_of(grid3, s3) == pytest.approx(4.0 * np.pi, rel=RTOL_2D)

    tool1 = Rectangle(0.0, -1.0, 4.0, 1.0)
    s4 = s3 - tool1
    assert area_of(grid1, s4) == pytest.approx(2.0 * np.pi, rel=RTOL_2D)

    s5 = s3 * tool1
    assert area_of(grid2, s5) == pytest.approx(2.0 * np.pi, rel=RTOL_2D)

    s6 = s4 + s5
    assert area_of(grid3, s6) == pytest.approx(4.0 * np.pi, rel=RTOL_2D)

    tool2 = Rectangle(-4.0, -1.0, 4.0, 1.0)
    s7 = Specification(tool2, lambda x: x[..., 1] < np.cos(np.pi * x[..., 0]))
    assert area_of(grid1, s7) == pytest.approx(8.0, rel=RTOL_2D)

    s8 = Transform(s2, A=rotmat(np.pi / 7), b=np.array([-2.0, 0.0, 0.0]))
    assert area_of(grid2, s8) == pytest.approx(12.0, rel=RTOL_2D)

    s9 = Polygon((-1.0, 0.0), (2.0, 0.0), (0.0, 3.0))
    assert area_of(grid3, s9) == pytest.approx(4.5, rel=RTOL_2D)


def test_volumes():
    # mirrors sph_jl/tests/test_geometry.jl:109-141
    grid1 = Grid(1 / N, "cubic")
    grid2 = Grid(1 / N, "facecentered")
    grid3 = Grid(1 / N, "bodycentered")
    grid4 = Grid(1 / N, "diamond")

    s1 = Box(-0.7, -0.6, -0.5, 0.7, 0.6, 0.5)
    assert vol_of(grid1, s1) == pytest.approx(1.4 * 1.2 * 1.0, rel=RTOL_3D)

    s2 = Ball(0.0, 0.0, 0.0, 0.8)
    assert vol_of(grid2, s2) == pytest.approx(4 / 3 * np.pi * 0.8**3, rel=RTOL_3D)

    s3 = Ellipsoid(0.0, 0.0, 0.0, 0.8, 0.5, 0.3)
    assert vol_of(grid3, s3) == pytest.approx(4 / 3 * np.pi * 0.8 * 0.5 * 0.3, rel=RTOL_3D)

    s4 = Cone(0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.6, 0.3)
    assert vol_of(grid4, s4) == pytest.approx(np.pi * (2 * 0.6 * 0.6 - 0.3 * 0.3) / 3, rel=RTOL_3D)

    tool1 = Polygon((0.0, 0.0), (0.6, 0.0), (0.0, 0.7))
    s5 = RevolutionBody(tool1)
    assert vol_of(grid1, s5) == pytest.approx(np.pi / 3 * 0.6 * 0.6 * 0.7, rel=RTOL_3D)


def test_closed_spline_approximates_circle():
    # a spline through 8 points on a circle should enclose ~its area
    pts = [(np.cos(t), np.sin(t)) for t in np.linspace(0, 2 * np.pi, 8, endpoint=False)]
    s = ClosedSpline(*pts, n=128)
    grid = Grid(1 / N, "square")
    assert area_of(grid, s) == pytest.approx(np.pi, rel=0.05)


def test_exp_grid_stratification():
    # ExpGrid (src/grids.jl:130-174): layer density ∝ exp(-K y)
    grid = Grid(0.01, "exp", K=2.0)
    dom = Rectangle(0.0, 0.0, 1.0, 1.0)
    pts = covering(grid, dom)
    assert len(pts) > 0
    lower = np.sum(pts[:, 1] < 0.5)
    upper = np.sum(pts[:, 1] >= 0.5)
    # truncated exp CDF: mass below 0.5 = (1-e^-1)/(1-e^-2)
    expect = (1 - np.exp(-1.0)) / (1 - np.exp(-2.0))
    assert lower / (lower + upper) == pytest.approx(expect, rel=0.05)


def test_witch_shape():
    w = Witch(1000.0, 2000.0, -10e3, 10e3)
    assert bool(np.all(w.is_inside(np.array([[0.0, 500.0, 0.0]]))))
    assert not bool(np.any(w.is_inside(np.array([[0.0, 1500.0, 0.0]]))))
    # matches the scripts' Specification construction (wcsph_perturbed_witch.jl:158-159)
    assert bool(np.all(w.is_inside(np.array([[2000.0, 499.0, 0.0]]))))  # profile = h/2 at x=a


def test_boundary_layer_walls():
    # the wall-construction idiom (collapse_dry.jl:92-93)
    from sph_mountain_waves_tpu import BoundaryLayer
    grid = Grid(0.05, "square")
    box = Rectangle(0.0, 0.0, 1.0, 1.0)
    walls = BoundaryLayer(box, grid, 0.1)
    pts = covering(grid, walls)
    assert len(pts) > 0
    inside_box = box.is_inside(pts)
    assert not inside_box.any()  # walls strictly outside the box
    # every wall point within width of the box
    d = np.maximum(np.maximum(0.0 - pts[:, 0], pts[:, 0] - 1.0), 0.0)
    dy = np.maximum(np.maximum(0.0 - pts[:, 1], pts[:, 1] - 1.0), 0.0)
    assert np.all(np.sqrt(d**2 + dy**2) <= 0.1 + 1e-9)
