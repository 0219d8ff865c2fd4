#!/bin/bash
# Probe the TPU tunnel every 5 min; when it answers, run the
# flux-instrumented linear-drag job (scripts/linear_drag.py, Pallas path).
while true; do
  if timeout 180 python -c "import jax; import jax.numpy as jnp; assert jax.devices()[0].platform != 'cpu'; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1; then
    echo "tunnel up $(date +%H:%M:%S)" >> /tmp/tunnel_watch_drag.log
    flock /tmp/tpu_job.lock timeout 7200 python -c "
import sys
sys.path.insert(0, '/root/repo'); sys.path.insert(0, '/root/repo/scripts')
from linear_drag import run
run(n_rows=200, t_end=2200.0, use_pallas=True, verbose=True, avg_window=0.25)
" >> /tmp/linear_drag_flux.log 2>&1
    echo "drag job done rc=$? $(date +%H:%M:%S)" >> /tmp/tunnel_watch_drag.log
    break
  fi
  echo "tunnel down $(date +%H:%M:%S)" >> /tmp/tunnel_watch_drag.log
  sleep 300
done
