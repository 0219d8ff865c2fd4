#!/bin/bash
# Round-5 second TPU chain, value-ordered: x-tiling proof first, then the
# bench_all cold + warm (compile-cache) passes, then RB physics arms,
# then the soak. Waits for the flux campaign (chain1 + arm E) to finish.
cd /root/repo
S=scripts/tpu_r5.sh
while ! grep -q "r5 chain1b done" /tmp/tpu_r5.log 2>/dev/null; do sleep 120; done
bash $S /tmp/r5_cliff_run.log scripts/r5_cliff.py
bash $S /tmp/r5_benchall_run.log scripts/bench_all.py
bash $S /tmp/r5_benchall_run.log scripts/bench_all.py   # warm-cache pass
bash $S /tmp/r5_nu_run.log scripts/r5_nu_tpu.py ab
bash $S /tmp/r5_nu_run.log scripts/r5_nu_tpu.py deep
bash $S /tmp/r5_soak_run.log scripts/r5_soak.py
echo "r5 chain2 done $(date +%H:%M:%S)" >> /tmp/tpu_r5.log
