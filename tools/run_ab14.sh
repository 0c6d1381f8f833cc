#!/bin/bash
cd /root/repo
set -x
BENCH_FAST=1 timeout 3600 python bench.py > tools/out/bench_sanity.log 2>&1
echo "sanity: $?"
echo ALL_DONE14
