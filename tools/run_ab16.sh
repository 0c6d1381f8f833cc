#!/bin/bash
cd /root/repo
set -x
DB_B=64 timeout 1200 python tools/dbench.py kvw > tools/out/db_kvw_b64_scatter.log 2>&1
DB_KVW=onehot DB_B=64 timeout 1200 python tools/dbench.py kvw > tools/out/db_kvw_b64_onehot.log 2>&1
DB_B=8 timeout 1200 python tools/dbench.py kvw > tools/out/db_kvw_b8_scatter.log 2>&1
echo ALL_DONE16
