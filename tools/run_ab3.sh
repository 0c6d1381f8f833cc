#!/bin/bash
# Round-4 A/B session 3: qmm bound diagnosis + gmm row + q8 gate.
cd /root/repo
# wait for ab2 to finish (TPU is exclusive)
for i in $(seq 1 200); do
  grep -q ALL_DONE2 tools/out/ab2.log 2>/dev/null && break
  sleep 15
done
set -x
timeout 3600 python tools/tpu_compile_gate.py > tools/out/gate3.log 2>&1
echo "gate3: $?"
DB_B=64 DB_NL=8 DB_TILE_N=1024 timeout 2400 python tools/dbench.py qmm > tools/out/db_qmm8_b64.log 2>&1
DB_B=8  DB_NL=8 DB_TILE_N=1024 timeout 2400 python tools/dbench.py qmm qmm_nomin dense > tools/out/db_qmm8_trio.log 2>&1
timeout 2400 python tools/dbench.py gmm > tools/out/db_gmm.log 2>&1
echo ALL_DONE3
