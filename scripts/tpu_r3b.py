"""Round-3 follow-up TPU batch (run by the tunnel watcher when the TPU
returns): the measurements lost to the 23:15 tunnel crash.

Order: cheap known-good shapes first, the suspect linear-drag run LAST
(its 23:15 attempt ended in "TPU worker process crashed — kernel fault";
if it kills the worker again, nothing else is lost).
"""
import subprocess
import sys
import time

LOG = "/tmp/tpu_r3b_results.log"

CHILD_RB = r'''
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import rayleigh_benard as rb
cfg = rb.baseline_config()
sys_ = rb.make_system(cfg)
state = sys_.freeze()
step = rb.make_step(cfg, sys_.engine)
n = sys_.n_built
print("built n =", n, flush=True)
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=100)
    return s
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / 100)
print(f"RESULT rb n={n} ms_step={best*1000:.3f} ps={n/best:.4g}")
'''

CHILD_DAM = r'''
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import collapse_dry as cd
from sph_mountain_waves_tpu.models.common import frame_runner
cfg = cd.Config(dr=0.014, dtype="float32", layout="bucket", skin=0.15,
                use_pallas=True)
sys_ = cd.make_system(cfg)
state = sys_.freeze()
step, init_forces = cd.make_step(cfg, sys_.engine)
state = jax.jit(init_forces, donate_argnums=0)(state)
run_frame = frame_runner(step, 200)
t0 = time.perf_counter()
state = run_frame(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
n = sys_.n_built
best = 0.0
for _ in range(3):
    t0 = time.perf_counter()
    state = run_frame(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = max(best, n * 200 / (time.perf_counter() - t0))
print(f"RESULT dam n={n} ps={best:.4g} ms_step={n/best*1000:.4f}")
'''

CHILD_ISPH = r'''
import time, sys
from functools import partial
import jax, jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from sph_mountain_waves_tpu.models import isph_witch as iw
cfg = iw.baseline_config(cg_tol=1e-5)
sys_ = iw.make_system(cfg)
state = sys_.freeze()
step = iw.make_step(cfg, sys_.engine)
n = sys_.n_built
@partial(jax.jit, donate_argnums=0)
def run(s):
    s, _ = jax.lax.scan(lambda s, _: (step(s), None), s, None, length=20)
    return s
t0 = time.perf_counter()
state = run(state)
float(jnp.sum(state.fields["x"][:, 1]))
print(f"compile+first: {time.perf_counter()-t0:.1f}s", flush=True)
best = 1e9
for _ in range(3):
    t0 = time.perf_counter()
    state = run(state)
    float(jnp.sum(state.fields["x"][:, 1]))
    best = min(best, (time.perf_counter() - t0) / 20)
it = float(state.fields["cg_it"][0]); res = float(state.fields["cg_res"][0])
print(f"RESULT isph tol=1e-5 n={n} ms_step={best*1000:.2f} "
      f"ps={n/best:.4g} cg_it={it:.0f} cg_res={res:.2e}")
'''

CHILD_DRAG = r'''
import sys
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")
from linear_drag import run
# XLA path: the fused adia Pallas kernels are not yet parity-gated under
# the corrected-physics flags, and the 23:15 worker crash is unexplained
run(n_rows=200, t_end=2500.0, use_pallas=False, verbose=False)
'''


def run_job(name, code, timeout_s):
    with open(LOG, "a") as f:
        f.write(f"--- {name} start {time.strftime('%H:%M:%S')}\n")
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout_s, check=False)
        tail = "\n".join((r.stdout + r.stderr).splitlines()[-10:])
        with open(LOG, "a") as f:
            f.write(f"{name} rc={r.returncode}\n{tail}\n")
    except subprocess.TimeoutExpired:
        with open(LOG, "a") as f:
            f.write(f"{name} TIMEOUT after {timeout_s}s\n")


def main():
    jobs = sys.argv[1:] or ["isph", "rb", "dam", "drag"]
    if "isph" in jobs:
        run_job("isph_tol1e-5", CHILD_ISPH, 2400)
    if "rb" in jobs:
        run_job("rb_51k", CHILD_RB, 2400)
    if "dam" in jobs:
        run_job("dam_10k", CHILD_DAM, 1800)
    if "drag" in jobs:
        run_job("linear_drag", CHILD_DRAG, 7200)
    with open(LOG, "a") as f:
        f.write("R3B DONE\n")


if __name__ == "__main__":
    main()
