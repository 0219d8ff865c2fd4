#!/bin/bash
# Round-5 first TPU chain: the flux-profile campaign (north-star item).
# Arms run as SEPARATE serialized jobs so a worker crash loses one arm,
# not the chain; each gets the tunnel probe + flock via tpu_r5.sh.
cd /root/repo
S=scripts/tpu_r5.sh
for ARM in A B C; do
  bash $S /tmp/r5_profile_run.log scripts/r5_flux_profile.py $ARM
  grep -q "PROFILE ${ARM}_" /tmp/r5_profile.log 2>/dev/null || \
    bash $S /tmp/r5_profile_run.log scripts/r5_flux_profile.py $ARM
done
echo "r5 chain1 done $(date +%H:%M:%S)" >> /tmp/tpu_r5.log
