#!/bin/bash
# Round-4 A/B session 2: re-gate, full qmm chain, attn page-size sweep.
cd /root/repo
set -x
timeout 3600 python tools/tpu_compile_gate.py > tools/out/gate2.log 2>&1
echo "gate2: $?"
DB_NL=22 DB_TILE_N=1024 timeout 2400 python tools/dbench.py qmm > tools/out/db_qmm22_f32.log 2>&1
DB_NL=8 DB_TILE_N=1024 timeout 2400 python tools/dbench.py qmm_bf16 > tools/out/db_qmm8_bf16b.log 2>&1
DB_B=64 DB_BS=16 DB_PAP=32 DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b64_bs16_p32.log 2>&1
DB_B=64 DB_BS=32 DB_PAP=16 DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b64_bs32_p16.log 2>&1
DB_B=64 DB_BS=32 DB_PAP=8  DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b64_bs32_p8.log 2>&1
DB_B=8  DB_BS=32 DB_PAP=8  DB_NL=22 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_b8_bs32_p8.log 2>&1
echo ALL_DONE2
