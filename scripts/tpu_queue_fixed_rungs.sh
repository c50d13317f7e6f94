#!/bin/bash
# Round-4 follow-up: re-run the three previously-OOM model rungs after the
# HBM fixes (channel-first indexed_add, march remat + channel-first output,
# batch lax.map, chunked shadow_at_points, OLAT UNet remat). Fire after
# tpu_queue.sh prints QUEUE DONE. Waits for any PID in WAIT_PID first.
set -u
cd /root/repo
export PYTHONHASHSEED=0

run() {  # run <tag> <timeout-s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a /tmp/r4q_status.log
  timeout "$to" "$@" > "/tmp/r4q_$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date +%H:%M:%S)" | tee -a /tmp/r4q_status.log
}

while [ -n "${WAIT_PID:-}" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30
done

run meshvae2 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=mesh_vae \
    GOLIATH_BENCH_BATCH=4 python bench.py
run handmvp2 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=hand_mvp \
    GOLIATH_BENCH_BATCH=4 python bench.py
run teacher2 2400 env GOLIATH_BENCH_SINGLE=1 \
    GOLIATH_BENCH_MODEL=hand_teacher GOLIATH_BENCH_BATCH=1 python bench.py

echo "FIXED-RUNG QUEUE DONE $(date)" | tee -a /tmp/r4q_status.log
