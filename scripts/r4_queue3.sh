#!/bin/bash
# Round-4 session-2, queue 3: rerun the three never-banked rungs with the
# seam/interp/cumsum fixes, then the banker (failed on an edit race) and
# fresh RGCA rungs (the cumsum/reduce change altered their HLO -> re-prewarm
# the compile cache for the driver).
set -u
cd /root/repo
export PYTHONHASHSEED=0

run() {
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a /tmp/r4q3_status.log
  timeout "$to" "$@" > "/tmp/r4q3_$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date +%H:%M:%S)" | tee -a /tmp/r4q3_status.log
}

run meshvae 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=mesh_vae \
    GOLIATH_BENCH_BATCH=4 JAX_TRACEBACK_FILTERING=off python bench.py
run teacher 2400 env GOLIATH_BENCH_SINGLE=1 \
    GOLIATH_BENCH_MODEL=hand_teacher GOLIATH_BENCH_BATCH=1 \
    JAX_TRACEBACK_FILTERING=off python bench.py
run handmvp 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=hand_mvp \
    GOLIATH_BENCH_BATCH=4 JAX_TRACEBACK_FILTERING=off python bench.py
run banker 900 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_IMG_H=512 \
    GOLIATH_BENCH_IMG_W=512 GOLIATH_BENCH_UV=256 GOLIATH_BENCH_BATCH=1 \
    python bench.py
run b1 1500 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=1 \
    GOLIATH_RGCA_REMAT=0 python bench.py
run b4 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=4 \
    GOLIATH_RGCA_REMAT=0 python bench.py
run urhand 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=urhand \
    GOLIATH_BENCH_BATCH=1 python bench.py

echo "QUEUE3 DONE $(date)" | tee -a /tmp/r4q3_status.log
