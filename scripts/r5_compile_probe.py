"""Round-5: where does the terrain compile time go? (VERDICT r4 weak #1)

CPU-backend structural probe: lower + compile the terrain_flow 50-step
scan program in pieces and report trace/lower/compile wall times and HLO
sizes.  The TPU (axon) compile is remote, but XLA scaling pathologies
show up on CPU too; if CPU compile is small across the board the 1953 s
is Mosaic-remote/tunnel time, which the persistent compilation cache
addresses instead.
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
from functools import partial

import jax.numpy as jnp  # noqa: E402


def probe(tag, fn, state):
    t0 = time.perf_counter()
    lowered = fn.lower(state)
    t_lower = time.perf_counter() - t0
    hlo = lowered.as_text()
    t0 = time.perf_counter()
    compiled = lowered.compile()
    t_comp = time.perf_counter() - t0
    print(f"{tag}: lower={t_lower:.1f}s compile={t_comp:.1f}s "
          f"hlo={len(hlo) / 1e6:.2f}MB", flush=True)
    return compiled


def main(use_pallas=False):
    from sph_mountain_waves_tpu.models import legacy_witch as lw
    cfg = lw.terrain_baseline_config(use_pallas=use_pallas, fast_math=False)
    sys_ = lw.make_system(cfg)
    sys_.freeze_opts["capacity"] = int(sys_.n_built * 1.3)
    if sys_.freeze_opts.get("layout") == "bucket":
        sys_.freeze_opts["rescatter_mode"] = "stencil"
    state = sys_.freeze()
    eng = sys_.engine
    step = lw.make_step(cfg, eng)
    print(f"n={sys_.n_built} cap={eng.cap} lims={eng.lims}", flush=True)

    @partial(jax.jit, donate_argnums=0)
    def scan50(s):
        s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=50)
        return s

    @jax.jit
    def one_step(s):
        return step(s)

    @jax.jit
    def rebuild_only(s):
        s2, _ = eng.rebuild(s)
        return s2

    probe("rebuild(cond+compact)", rebuild_only, state)
    probe("one_step", one_step, state)
    probe("scan50", scan50, state)


if __name__ == "__main__":
    main(use_pallas="pallas" in sys.argv[1:])
