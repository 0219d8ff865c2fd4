"""Dam rescatter-lowering A/B on the real chip: einsum (precision=
HIGHEST, round-4 default) vs the round-5 elementwise k-loop."""
import sys, time
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from functools import partial
import sph_mountain_waves_tpu.ops.neighbors as nb
from sph_mountain_waves_tpu.models import collapse_dry as cd

for mx, tag in ((10**12, "einsum"), (0, "kloop")):
    nb._COMPACT_EINSUM_TEMP_MAX = mx
    cfg = cd.Config(dr=0.014, dtype="float32", layout="bucket", skin=0.15,
                    use_pallas=True)
    sys_ = cd.make_system(cfg)
    state = sys_.freeze()
    step, init_forces = cd.make_step(cfg, sys_.engine)
    state = jax.jit(init_forces, donate_argnums=0)(state)
    @partial(jax.jit, donate_argnums=0)
    def run(s):
        s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None,
                            length=100)
        return s
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    comp = time.perf_counter() - t0
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        state = run(state)
        float(jnp.sum(state.fields["x"][:, 1]))
        best = min(best, (time.perf_counter() - t0) / 100)
    print(f"DAMAB {tag}: ms_step={best * 1e3:.3f} compile={comp:.0f}s",
          flush=True)
