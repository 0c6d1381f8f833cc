#!/bin/bash
cd /root/repo
for i in $(seq 1 400); do
  grep -q ALL_DONE14 tools/out/ab14.log 2>/dev/null && break
  sleep 15
done
set -x
DB_SAMP_NULL=1 DB_B=64 timeout 1200 python tools/dbench.py samp > tools/out/db_samp_b64_null.log 2>&1
echo ALL_DONE15
