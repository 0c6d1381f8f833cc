#!/bin/bash
cd /root/repo
set -x
timeout 5400 python bench.py > tools/out/bench_r4e.log 2>&1
echo "bench5: $?"
echo ALL_DONE12
