#!/bin/bash
# Round-4 kernel A/B session 1: compile gate, qmm variants, attn pages/step.
cd /root/repo
set -x
timeout 3600 python tools/tpu_compile_gate.py > tools/out/gate.log 2>&1
echo "gate done: $?"
# qmm variants on a trimmed 8-layer chain (relative A/B; full chain later)
for v in qmm_f32 qmm_bf16 qmm_i16; do
  DB_NL=8 DB_TILE_N=1024 timeout 2400 python tools/dbench.py $v \
    > tools/out/db_$v.log 2>&1
done
# paged attention: B=8 and B=64, pages-per-step sweep
DB_B=8  DB_PAP=8  DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b8_p8.log 2>&1
DB_B=64 DB_PAP=8  DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b64_p8.log 2>&1
DB_B=64 DB_PAP=16 DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b64_p16.log 2>&1
DB_B=64 DB_PAP=1  DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b64_p1.log 2>&1
echo ALL_DONE
