"""Cross-implementation trajectory gates at the BASELINE rtol-1e-3 bar:
the production fast path (float32, bucket-resident layout, skin) must track
the reference-shaped path (float64, flat layout, skin=0) over hundreds of
steps — same physics through two completely different engine layouts and
precisions (VERDICT r1 weak #8)."""
import pytest
import jax
import numpy as np

from sph_mountain_waves_tpu.models import collapse_dry as cd
from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.witch_common import (
    WitchConfig, velocity_diagnostics,
)

RTOL = 1e-3  # BASELINE.json: "observables to rtol 1e-3"


def test_witch_trajectory_f32bucket_vs_f64flat():
    series = {}
    for tag, kw in [("ref", dict(dtype="float64", layout="flat", skin=0.0)),
                    ("fast", dict(dtype="float32", layout="bucket", skin=0.2))]:
        cfg = WitchConfig(n_rows=14, self_density=True, **kw)
        sys = w.make_system(cfg)
        st = sys.freeze()
        step = jax.jit(w.make_step(cfg, sys.engine))
        out = []
        for k in range(200):
            st = step(st)
            if (k + 1) % 50 == 0:
                out.append([float(v) for v in velocity_diagnostics(st)])
        series[tag] = np.asarray(out)
    np.testing.assert_allclose(series["fast"], series["ref"], rtol=RTOL)


@pytest.mark.heavy
def test_dambreak_observables_f32bucket_vs_f64flat():
    series = {}
    for tag, kw in [("ref", dict(dtype="float64", layout="flat", skin=0.0)),
                    ("fast", dict(dtype="float32", layout="bucket", skin=0.2))]:
        cfg = cd.Config(dr=0.05, t_end=0.5, n_frames=10, **kw)
        out = cd.run(cfg)
        series[tag] = np.stack([out["X"], out["H"], out["E"]])
    np.testing.assert_allclose(series["fast"], series["ref"], rtol=RTOL)
