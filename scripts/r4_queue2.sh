#!/bin/bash
# Round-4 session-2 measurement queue. QUALITY.md is already banked, so
# skip qtest; go straight at the three never-banked model rungs (VERDICT
# r3 item 1) with the committed OOM fixes, then prewarm the RGCA/URHand
# ladder cache keys. Logs land in /tmp/r4q_*.log; status in
# /tmp/r4q_status.log.
set -u
cd /root/repo
export PYTHONHASHSEED=0

run() {  # run <tag> <timeout-s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a /tmp/r4q_status.log
  timeout "$to" "$@" > "/tmp/r4q_$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date +%H:%M:%S)" | tee -a /tmp/r4q_status.log
}

# health gate
for i in $(seq 1 30); do
  if timeout 120 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "TPU up at $(date)" | tee -a /tmp/r4q_status.log; break
  fi
  sleep 120
done

# 1. DIAGNOSIS rungs: the three models that have never banked a TPU number
run meshvae 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=mesh_vae \
    GOLIATH_BENCH_BATCH=4 JAX_TRACEBACK_FILTERING=off python bench.py
run handmvp 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=hand_mvp \
    GOLIATH_BENCH_BATCH=4 JAX_TRACEBACK_FILTERING=off python bench.py
run teacher 2400 env GOLIATH_BENCH_SINGLE=1 \
    GOLIATH_BENCH_MODEL=hand_teacher GOLIATH_BENCH_BATCH=1 \
    JAX_TRACEBACK_FILTERING=off python bench.py

# 2. RGCA + URHand rungs (prewarm the driver ladder's cache keys)
run b4 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=4 \
    GOLIATH_RGCA_REMAT=0 python bench.py
run b1 1500 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=1 \
    GOLIATH_RGCA_REMAT=0 python bench.py
run urhand 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=urhand \
    GOLIATH_BENCH_BATCH=1 python bench.py

# 3. banker rung prewarm
run banker 900 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_IMG_H=512 \
    GOLIATH_BENCH_IMG_W=512 GOLIATH_BENCH_UV=256 GOLIATH_BENCH_BATCH=1 \
    python bench.py

echo "QUEUE DONE $(date)" | tee -a /tmp/r4q_status.log
