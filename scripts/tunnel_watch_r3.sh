#!/bin/bash
# Probe the TPU tunnel every 5 min; when it answers, run the round-3b batch.
while true; do
  if timeout 180 python -c "import jax; import jax.numpy as jnp; assert jax.devices()[0].platform != 'cpu'; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1; then
    echo "tunnel up $(date +%H:%M:%S)" >> /tmp/tunnel_watch_r3.log
    python /root/repo/scripts/tpu_r3b.py >> /tmp/tunnel_watch_r3.log 2>&1
    break
  fi
  echo "tunnel down $(date +%H:%M:%S)" >> /tmp/tunnel_watch_r3.log
  sleep 300
done
