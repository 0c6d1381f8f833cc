#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE7 tools/out/ab7.log 2>/dev/null && break
  sleep 15
done
set -x
DB_B=64 timeout 1200 python tools/dbench.py samp > tools/out/db_samp_b64_union.log 2>&1
timeout 5400 python bench.py > tools/out/bench_r4c.log 2>&1
echo "bench3: $?"
echo ALL_DONE8
