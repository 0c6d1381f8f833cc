#!/bin/bash
cd /root/repo
set -x
BENCH_8B=1 BENCH_FAST=1 timeout 7200 python bench.py > tools/out/bench_8b.log 2>&1
echo "bench8b: $?"
echo ALL_DONE13
