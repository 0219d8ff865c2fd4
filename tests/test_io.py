"""PVD/VTP round-trip tests matching the reference suite
(sph_jl/tests/test_IO.jl): save scalar/vector/matrix fields, assert files
exist, re-import and assert exact field equality — twice (append doubles N)."""
import os
import shutil

import numpy as np
import pytest

from sph_mountain_waves_tpu import (
    Circle, Grid, ParticleSystem, generate_particles, import_particles,
    new_pvd_file, read_vtp, save_frame, save_pvd_file,
)

DR = 1 / 100
H = 2 * DR


def get_vars(x):
    # same synthetic data as test_IO.jl:18-24
    s = x[:, 1]
    v = np.stack([x[:, 1], -x[:, 0]], axis=-1)
    M = x[:, 0][:, None, None] * np.arange(9.0).reshape(3, 3)[None]
    return s, v, M


def make_sys():
    import jax.numpy as jnp
    dom = Circle(0.0, 0.0, 1.0)
    return ParticleSystem(fields={"x": 2, "s": 0, "v": 2, "M": (3, 3)},
                          domain=dom, h=0.1, dim=2, dtype=jnp.float64)


@pytest.fixture
def io_dir(tmp_path):
    return str(tmp_path / "test_IO")


def test_roundtrip(io_dir):
    sys = make_sys()
    grid = Grid(DR, "hexagonal")
    generate_particles(sys, grid, Circle(0.0, 0.0, 1.0), lambda xs: {})
    host = sys.host_fields()
    s, v, M = get_vars(host["x"])
    sys._chunks[0]["s"] = s
    sys._chunks[0]["v"] = v
    sys._chunks[0]["M"] = M
    sys.freeze()

    out = new_pvd_file(io_dir)
    save_frame(out, sys, "s", "v", "M")
    save_pvd_file(out)
    assert os.path.exists(os.path.join(io_dir, "frame0.vtp"))
    assert os.path.exists(os.path.join(io_dir, "result.pvd"))

    # read back
    sys2 = make_sys()
    n = import_particles(sys2, os.path.join(io_dir, "frame0.vtp"))
    assert n == sys.n
    host2 = sys2.host_fields()
    s2, v2, M2 = get_vars(host2["x"])
    np.testing.assert_allclose(host2["s"], s2, atol=1e-12)
    np.testing.assert_allclose(host2["v"], v2, atol=1e-12)
    np.testing.assert_allclose(host2["M"], M2, atol=1e-12)

    # import again — append semantics doubles N (test_IO.jl:56-59)
    import_particles(sys2, os.path.join(io_dir, "frame0.vtp"))
    assert sys2.n_built == 2 * sys.n

    shutil.rmtree(io_dir)


def test_read_vtp_points(io_dir):
    sys = make_sys()
    sys.add_particles(np.array([[0.1, 0.2], [0.3, 0.4]]), {"s": np.array([1.0, 2.0])})
    sys.freeze()
    out = new_pvd_file(io_dir)
    path = save_frame(out, sys, "s")
    pts, fields = read_vtp(path)
    np.testing.assert_allclose(pts[:, :2], [[0.1, 0.2], [0.3, 0.4]])
    np.testing.assert_allclose(fields["s"], [1.0, 2.0])


@pytest.mark.smoke
def test_csv_artifact_channel(io_dir):
    """A run with out_path leaves PVD + data.csv behind (the reference's
    data.csv channel, collapse_dry.jl:226-227)."""
    import os
    from sph_mountain_waves_tpu.io import read_csv
    from sph_mountain_waves_tpu.models import collapse_dry as cd

    out_dir = os.path.join(io_dir, "csvrun")
    cfg = cd.Config(dr=0.12, t_end=0.15, n_frames=3)
    out = cd.run(cfg, out_path=out_dir)
    assert os.path.exists(os.path.join(out_dir, "result.pvd"))
    back = read_csv(os.path.join(out_dir, "data.csv"))
    assert set(back) == {"t", "X", "H", "E"}
    np.testing.assert_allclose(back["E"], out["E"], rtol=1e-12)


def test_init_vtp_frame_restart(io_dir):
    """Frame-as-initial-condition boot (reference import_particles!/init_vtp
    idiom, src/IO.jl:83-122): a witch scheme booted from a saved frame
    carries the frame's exported fields verbatim and keeps stepping; a
    legacy flow scheme does the same (typed boundaries preserved)."""
    import dataclasses
    import os

    from sph_mountain_waves_tpu.io import read_vtp
    from sph_mountain_waves_tpu.models import legacy_witch as lw
    from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
    from sph_mountain_waves_tpu.models.witch_common import WitchConfig

    out_dir = os.path.join(io_dir, "vtprun")
    cfg = WitchConfig(n_rows=10, t_end=4.0, n_frames=2, dtype="float64")
    w.run(cfg, out_path=out_dir)
    frame = os.path.join(out_dir, "frame2.vtp")
    pts, data = read_vtp(frame)

    cfg2 = dataclasses.replace(cfg, init_vtp=frame)
    sys = w.make_system(cfg2)
    st = sys.freeze()
    act = np.asarray(st.active)
    assert act.sum() == len(pts)
    # flat layout keeps add order: fields land verbatim
    np.testing.assert_allclose(np.asarray(st.fields["x"])[act], pts[:, :2])
    for name in ("v", "rho", "P", "type"):
        got = np.asarray(st.fields[name])[act].reshape(len(pts), -1)
        # VTP pads vectors to 3 components (ParaView convention)
        want = np.asarray(data[name]).reshape(len(pts), -1)[:, :got.shape[1]]
        np.testing.assert_allclose(got, want)
    # and the restarted run steps
    res = w.run(dataclasses.replace(cfg2, t_end=2.0, n_frames=1))
    assert np.isfinite(res["u_max"]).all()

    # legacy flow scheme: typed boundaries come from the frame
    lcfg = lw.isothermal_flow_config(n_rows=10, dom_length=60e3,
                                     t_end=1.0, n_frames=1, dtype="float64")
    lout = os.path.join(io_dir, "legacyrun")
    lw.run(lcfg, out_path=lout)
    lframe = os.path.join(lout, "frame1.vtp")
    res2 = lw.run(dataclasses.replace(lcfg, init_vtp=lframe))
    st2 = res2["state"]
    ty = np.asarray(st2.fields["type"])[np.asarray(st2.active)]
    assert (ty == lw.INFLOW).any() and (ty == lw.MOUNTAIN).any()
    assert np.isfinite(res2["drag"]).all()
