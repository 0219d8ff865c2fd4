#!/bin/bash
# Arm E (tall domain, deep sponge) queued behind arm C; flock in
# tpu_r5.sh serializes against chain2's jobs.
cd /root/repo
while ! grep -q "PROFILE C_" /tmp/r5_profile.log 2>/dev/null; do sleep 120; done
bash scripts/tpu_r5.sh /tmp/r5_profile_run.log scripts/r5_flux_profile.py E
grep -q "PROFILE E_" /tmp/r5_profile.log 2>/dev/null || \
  bash scripts/tpu_r5.sh /tmp/r5_profile_run.log scripts/r5_flux_profile.py E
echo "r5 chain1b done $(date +%H:%M:%S)" >> /tmp/tpu_r5.log
