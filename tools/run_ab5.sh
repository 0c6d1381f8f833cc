#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE4 tools/out/ab4.log 2>/dev/null && break
  sleep 15
done
set -x
timeout 3600 python tools/tpu_compile_gate.py > tools/out/gate4.log 2>&1
echo "gate4: $?"
DB_B=64 DB_NL=8 DB_TILE_N=1024 timeout 2400 python tools/dbench.py qmm > tools/out/db_qmm8_b64b.log 2>&1
DB_GMM_FUSED=1 timeout 2400 python tools/dbench.py gmm > tools/out/db_gmm_fused.log 2>&1
DB_GMM_FUSED=0 timeout 2400 python tools/dbench.py gmm > tools/out/db_gmm_unfused.log 2>&1
echo ALL_DONE5
