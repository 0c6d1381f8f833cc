#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE5 tools/out/ab5.log 2>/dev/null && break
  sleep 15
done
set -x
timeout 5400 python bench.py > tools/out/bench_r4.log 2>&1
echo "bench: $?"
echo ALL_DONE6
