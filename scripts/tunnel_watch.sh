#!/bin/bash
# Probe the axon TPU tunnel; when a tiny device op completes, run the
# measurement batch (scripts/tpu_batch.py). One TPU job at a time.
LOG=/tmp/tunnel_watch.log
echo "watch start $(date +%H:%M:%S)" >> "$LOG"
while true; do
  if timeout 90 python -c "
import jax, jax.numpy as jnp
assert jax.devices()[0].platform != 'cpu'
print(float(jnp.sum(jnp.ones((8,128)))))
" >> "$LOG" 2>&1; then
    echo "tunnel UP $(date +%H:%M:%S) — starting batch" >> "$LOG"
    python /root/repo/scripts/tpu_batch.py >> "$LOG" 2>&1
    echo "batch finished $(date +%H:%M:%S)" >> "$LOG"
    exit 0
  fi
  echo "tunnel down $(date +%H:%M:%S)" >> "$LOG"
  sleep 300
done
