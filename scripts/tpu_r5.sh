#!/bin/bash
# Round-5 TPU job runner: like tpu_r4.sh but forwards extra args to the
# job script.  Usage: scripts/tpu_r5.sh <logfile> <job.py> [args...]
# Probes the tunnel every 4 min; when it answers, runs the job under
# /tmp/tpu_job.lock (no two TPU jobs ever overlap) and exits with its rc.
LOG="$1"; shift
exec 9>/tmp/tpu_job.lock
flock 9 || exit 1
while true; do
  if timeout 180 python -c "import jax, jax.numpy as jnp; assert jax.devices()[0].platform != 'cpu'; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1; then
    echo "tunnel up $(date +%H:%M:%S) -> $*" >> /tmp/tpu_r5.log
    timeout 9000 python "$@" >> "$LOG" 2>&1
    rc=$?
    echo "job $* rc=$rc $(date +%H:%M:%S)" >> /tmp/tpu_r5.log
    exit $rc
  fi
  echo "tunnel down $(date +%H:%M:%S)" >> /tmp/tpu_r5.log
  sleep 240
done
