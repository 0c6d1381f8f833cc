#!/bin/bash
cd /root/repo
set -x
BENCH_FAST=1 timeout 3600 python bench.py > tools/out/bench_final.log 2>&1
echo "final: $?"
echo ALL_DONE17
