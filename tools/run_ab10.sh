#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE9 tools/out/ab9.log 2>/dev/null && break
  sleep 15
done
set -x
LLAMA_TPU_GUMBEL=hash DB_B=64 timeout 1200 python tools/dbench.py samp > tools/out/db_samp_b64_hash.log 2>&1
echo ALL_DONE10
