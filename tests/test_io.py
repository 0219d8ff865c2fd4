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
