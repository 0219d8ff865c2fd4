"""Round-5 long-run soak (VERDICT r4 #8): 10k production steps of the 1M
witch on the real TPU, recording per-frame sustained throughput and the
drift-triggered rescatter cadence as the static atmosphere's u_max grows
(~1 m/s per 100 steps — hydrostatic lattice imbalance, physics-faithful).
The bench regime (≤400 steps) sees 1-2 rescatters and underestimates the
sustained cost; this writes the sustained-throughput table.

Checkpointed every 20 frames (atomic, bitwise contract) to
/tmp/r5_soak_ckpt.npz; one JSON line per frame to /tmp/r5_soak.log.
"""
import json
import math
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.common import frame_runner
from sph_mountain_waves_tpu.models.witch_common import WitchConfig
from sph_mountain_waves_tpu.utils.checkpoint import save_checkpoint

STEPS_PER_FRAME = 100
N_FRAMES = 100
LOG = "/tmp/r5_soak.log"


def main(particles=1e6):
    from sph_mountain_waves_tpu.utils.cache import enable_persistent_cache
    enable_persistent_cache()  # after any cpu-forcing config (cache.py note)
    n_rows = max(8, int(round(math.sqrt(particles / (400e3 / 26e3)
                                        / 1.0746))))
    cfg = WitchConfig(n_rows=n_rows, dtype="float32", self_density=True,
                      layout="bucket", skin=0.15, use_pallas=True,
                      lattice_cells=True, lazy_diagnostics=True,
                      fast_math=True)
    sys_ = w.make_system(cfg)
    state = sys_.freeze()
    eng = sys_.engine
    # opt-in rescatter-cadence counter (ops/neighbors handles the
    # "_"-prefixed bookkeeping field in place across rescatters)
    state = state.replace(_rescatter_count=jnp.zeros(
        state.capacity, state.fields["x"].dtype))
    run = frame_runner(w.make_step(cfg, eng), STEPS_PER_FRAME,
                       finalize=w.make_finalize(cfg))
    n = sys_.n_built
    print(f"soak n={n} frames={N_FRAMES}x{STEPS_PER_FRAME}", flush=True)

    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    compile_s = time.perf_counter() - t0
    print(f"compile+frame1 {compile_s:.1f}s", flush=True)

    rc_prev = float(jnp.sum(state.fields["_rescatter_count"]))
    for k in range(2, N_FRAMES + 1):
        t0 = time.perf_counter()
        state = run(state)
        u_max = float(jnp.max(jnp.where(
            state.active, jnp.linalg.norm(state.fields["v"], axis=-1), 0.0)))
        wall = time.perf_counter() - t0
        rc = float(jnp.sum(state.fields["_rescatter_count"]))
        rec = {"frame": k, "t_sim": k * STEPS_PER_FRAME * cfg.dt,
               "ms_per_step": wall * 1e3 / STEPS_PER_FRAME,
               "psteps_per_s": n * STEPS_PER_FRAME / wall,
               "u_max": u_max, "rescatters_frame": rc - rc_prev,
               "rescatters_total": rc}
        rc_prev = rc
        line = json.dumps(rec)
        print(line, flush=True)
        with open(LOG, "a") as f:
            f.write(line + "\n")
        if k % 20 == 0:
            save_checkpoint("/tmp/r5_soak_ckpt.npz", state, engine=eng,
                            extra={"step": k * STEPS_PER_FRAME})


if __name__ == "__main__":
    if "cpu" in sys.argv[1:]:  # wiring smoke off-TPU
        jax.config.update("jax_platforms", "cpu")
        sys.argv.remove("cpu")
    main(float(sys.argv[1]) if len(sys.argv) > 1 else 1e6)
