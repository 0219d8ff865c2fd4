"""Round-5 bench_all regression probes (one serialized TPU job).

1. witch3d_stretch exits rc=1 in bench_all (both passes) — reproduce
   with the FULL traceback (bench_all tails only 6 lines).
2. dam_break reads 25 ms/step at 1000-step scans vs round-4's 0.92 at
   100-step scans. CPU shows no such growth, rescatter cadence accounts
   for ~2 ms at most. Separate scan-length from state-age on the real
   chip: 100-step scans to step 4000 (per-scan ms), then 1000-step
   scans, plus a NaN screen (NaN operands put the VPU on a ~15x slower
   path — CLAUDE.md).
"""
import subprocess
import sys
import time

W3D = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from sph_mountain_waves_tpu.models import witch3d as w3
from sph_mountain_waves_tpu.models.common import frame_runner
cfg = w3.stretch_config(bucket_cap=8)
sys_ = w3.make_system(cfg)
state = sys_.freeze()
state = w3.setup(cfg, sys_.engine, state)
run = frame_runner(w3.make_step(cfg, sys_.engine), 20,
                   finalize=w3.make_finalize(cfg))
t0 = time.perf_counter()
state = run(state)
print("W3D first scan ok", float(jnp.sum(state.fields["x"][:, 1])),
      time.perf_counter() - t0, flush=True)
'''

DAM = r'''
import sys, time
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.utils.cache import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp
from functools import partial
from sph_mountain_waves_tpu.models import collapse_dry as cd
cfg = cd.Config(dr=0.014, dtype="float32", layout="bucket", skin=0.15,
                use_pallas=True)
sys_ = cd.make_system(cfg)
state = sys_.freeze()
step, init_forces = cd.make_step(cfg, sys_.engine)
state = jax.jit(init_forces, donate_argnums=0)(state)
@partial(jax.jit, donate_argnums=0)
def run100(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=100)
    return s
@partial(jax.jit, donate_argnums=0)
def run1000(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=1000)
    return s
for k in range(40):
    t0 = time.perf_counter()
    state = run100(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    ms = (time.perf_counter() - t0) * 10.0
    if k % 4 == 3 or k < 3:
        f = state.fields
        nan = int(jnp.sum(~jnp.isfinite(f["v"])))
        print(f"DAM100 steps={(k+1)*100} ms_step={ms:.3f} nan_v={nan}",
              flush=True)
for k in range(2):
    t0 = time.perf_counter()
    state = run1000(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    print(f"DAM1000 scan{k} ms_step={(time.perf_counter()-t0):.4f}",
          flush=True)
'''

if __name__ == "__main__":
    for name, code, to in (("w3d", W3D, 2400), ("dam", DAM, 2400)):
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", code],
                           capture_output=True, text=True, timeout=to)
        print(f"=== {name} rc={r.returncode} ({time.time() - t0:.0f}s)",
              flush=True)
        out = r.stdout + r.stderr
        print(out[-4000:], flush=True)
