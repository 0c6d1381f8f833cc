#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE6 tools/out/ab6.log 2>/dev/null && break
  sleep 15
done
set -x
# sampling cost A/B: approx_max_k (new default) vs exact top_k path
DB_B=64 timeout 1200 python tools/dbench.py samp > tools/out/db_samp_b64_approx.log 2>&1
# then the full bench again with the sampling fix
timeout 5400 python bench.py > tools/out/bench_r4b.log 2>&1
echo "bench2: $?"
echo ALL_DONE7
