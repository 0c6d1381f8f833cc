#!/bin/bash
cd /root/repo
for i in $(seq 1 200); do
  grep -q ALL_DONE18 tools/out/ab18.log 2>/dev/null && break
  sleep 10
done
set -x
timeout 5400 python bench.py > tools/out/bench_final3.log 2>&1
echo "final3: $?"
echo ALL_DONE19
