#!/bin/bash
# Bisect the hand_teacher/hand_mvp TPU worker crash by scale axis.
# Each rung runs in a fresh subprocess; a health probe runs between rungs
# (a worker crash can take the axon tunnel down for a while).
cd /root/repo
probe() {
  for i in $(seq 1 12); do
    if timeout 150 python -c "import jax; jax.devices()" 2>/dev/null; then
      echo "== device healthy"; return 0
    fi
    echo "== device unhealthy, waiting 60s ($i)"; sleep 60
  done
  echo "== device DEAD, aborting"; exit 1
}
rung() {
  local tag="$1"; shift
  echo "==== rung $tag: $* ===="
  env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=hand_teacher \
      GOLIATH_BENCH_BATCH=1 GOLIATH_BENCH_STEPS=3 GOLIATH_BENCH_PALLAS=1 \
      PYTHONHASHSEED=0 JAX_TRACEBACK_FILTERING=off "$@" \
      timeout 900 python bench.py 2>runs/bench_logs/bisect_${tag}.stderr
  echo "==== rung $tag rc=$? ===="
  tail -3 runs/bench_logs/bisect_${tag}.stderr
  probe
}
probe
rung quarter  GOLIATH_BENCH_IMG_H=1024 GOLIATH_BENCH_IMG_W=672 GOLIATH_BENCH_UV=512
rung bigimg   GOLIATH_BENCH_IMG_H=2048 GOLIATH_BENCH_IMG_W=1344 GOLIATH_BENCH_UV=512
rung biguv    GOLIATH_BENCH_IMG_H=1024 GOLIATH_BENCH_IMG_W=672 GOLIATH_BENCH_UV=1024
rung full     GOLIATH_BENCH_IMG_H=2048 GOLIATH_BENCH_IMG_W=1344 GOLIATH_BENCH_UV=1024
