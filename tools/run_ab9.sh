#!/bin/bash
cd /root/repo
set -x
DB_B=64 timeout 1200 python tools/dbench.py samp > tools/out/db_samp_b64_cand.log 2>&1
# batch64-shaped attention (100-token caches): paged kernel vs XLA gather
DB_B=64 DB_BS=32 DB_PAP=16 DB_KVLEN=100 timeout 1800 python tools/dbench.py attn > tools/out/db_attn_b64_kv100_paged.log 2>&1
DB_ATTN_XLA=1 DB_B=64 DB_BS=32 DB_KVLEN=100 timeout 1800 python tools/dbench.py attn > tools/out/db_attn_b64_kv100_xla.log 2>&1
timeout 5400 python bench.py > tools/out/bench_r4d.log 2>&1
echo "bench4: $?"
echo ALL_DONE9
