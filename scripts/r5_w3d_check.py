"""Verify the round-5 witch3d OOM fix on the real chip (one scan + timing)."""
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
print("W3D scan ok", float(jnp.sum(state.fields["x"][:, 1])),
      f"compile+scan {time.perf_counter() - t0:.0f}s", flush=True)
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"W3D ms/step {(time.perf_counter() - t0) * 50:.1f}", flush=True)
