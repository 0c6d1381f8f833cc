#!/bin/bash
cd /root/repo
set -x
timeout 5400 python bench.py > tools/out/bench_final2.log 2>&1
echo "final2: $?"
echo ALL_DONE18
