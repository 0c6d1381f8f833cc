#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE10 tools/out/ab10.log 2>/dev/null && break
  sleep 15
done
set -x
LLAMA_TPU_TOPK=seg DB_B=64 timeout 1200 python tools/dbench.py samp > tools/out/db_samp_b64_seg.log 2>&1
LLAMA_TPU_TOPK=seg LLAMA_TPU_GUMBEL=hash DB_B=64 timeout 1200 python tools/dbench.py samp > tools/out/db_samp_b64_seghash.log 2>&1
echo ALL_DONE11
