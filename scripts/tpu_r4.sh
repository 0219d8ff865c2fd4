#!/bin/bash
# Round-4 TPU job chain. Jobs run SEQUENTIALLY under a lockfile so no two
# TPU jobs ever overlap (the round-3 FAILED_PRECONDITION incident; ADVICE
# round 3 asked for exactly this serialization).
#
# Usage: scripts/tpu_r4.sh <jobfile.py> [logfile]
# Probes the tunnel every 4 min; when it answers, runs the job under
# /tmp/tpu_job.lock and exits with the job's rc.
JOB="$1"
LOG="${2:-/tmp/tpu_r4_job.log}"
exec 9>/tmp/tpu_job.lock
flock 9 || exit 1
while true; do
  if timeout 180 python -c "import jax, jax.numpy as jnp; assert jax.devices()[0].platform != 'cpu'; print(float(jnp.sum(jnp.ones((8,128)))))" >/dev/null 2>&1; then
    echo "tunnel up $(date +%H:%M:%S) -> $JOB" >> /tmp/tpu_r4.log
    timeout 9000 python "$JOB" >> "$LOG" 2>&1
    rc=$?
    echo "job $JOB rc=$rc $(date +%H:%M:%S)" >> /tmp/tpu_r4.log
    exit $rc
  fi
  echo "tunnel down $(date +%H:%M:%S)" >> /tmp/tpu_r4.log
  sleep 240
done
