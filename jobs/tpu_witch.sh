#!/bin/bash
# TPU-VM production job: stratified mountain-wave flagship run.
# The TPU-native counterpart of the reference's SLURM script
# (reference jobs/example.sh: 1 node, 16 Julia threads, 3h wall):
# one v5e chip, jit-compiled bucket-layout engine, PVD frames to results/.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "=== JOB START $(date) on $(hostname) ==="
python - <<'PY'
from sph_mountain_waves_tpu.models import wcsph_perturbed_witch as w
from sph_mountain_waves_tpu.models.witch_common import WitchConfig

# measured-optimal layout (BENCHMARKS.md): skin 0.15 keeps bucket cap 8,
# lattice-aligned cells keep occupancy uniform, diagnostics lazy per frame
cfg = WitchConfig(n_rows=75, dtype="float32", self_density=True,
                  layout="bucket", skin=0.15, lattice_cells=True,
                  lazy_diagnostics=True, use_pallas=True, t_end=20.0)
out = w.run(cfg, out_path="results/wcsph_perturbed_witch", verbose=True)
print("final u_avg:", out["u_avg"][-1], "u_max:", out["u_max"][-1])
# multi-chip variant (8 chips over ICI), same artifact set:
#   from sph_mountain_waves_tpu.parallel.run import run_sharded_witch_bucket
#   out = run_sharded_witch_bucket(cfg, n_dev=8,
#                                  out_path="results/witch_8chip")
PY
echo "=== JOB END $(date) ==="
