#!/bin/bash
# Round-4 A/B session 4: Llama-3-8B-geometry rows (BASELINE north star).
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE3 tools/out/ab3.log 2>/dev/null && break
  sleep 15
done
set -x
DB_GEOM=8b DB_NL=32 DB_TILE_N=1024 timeout 3000 python tools/dbench.py qmm > tools/out/db_qmm_8b.log 2>&1
DB_GEOM=8b DB_B=8 DB_BS=32 DB_PAP=16 timeout 2400 python tools/dbench.py attn > tools/out/db_attn_8b.log 2>&1
echo ALL_DONE4
