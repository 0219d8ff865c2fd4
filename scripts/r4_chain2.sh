#!/bin/bash
# Round-4 second TPU chain (after the LJ worker crash): bank the
# driver-contract measurements first, then retry the risky LJ-floor run,
# then the RB Nu A/B and the 3.82M cliff probe. Sequential via tpu_r4.sh
# (tunnel probe + flock serialization, ADVICE r3).
cd /root/repo
S=scripts/tpu_r4.sh
bash $S scripts/bench_all.py /tmp/bench_all_run.log
bash $S scripts/r4_drag_lj.py /tmp/r4_drag_lj.log
grep -q "RESULT lj_drag" /tmp/r4_drag_lj.log || \
  bash $S scripts/r4_drag_lj.py /tmp/r4_drag_lj.log   # one retry
bash $S scripts/r4_nu_tpu.py /tmp/nu_tpu_run.log
bash $S scripts/cliff_probe.py /tmp/cliff.log
echo "chain2 done $(date +%H:%M:%S)" >> /tmp/tpu_r4.log
