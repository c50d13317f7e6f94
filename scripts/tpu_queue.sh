#!/bin/bash
# Sequential TPU work queue (round 4). Reordered from round 3: the three
# never-measured model rungs (mesh_vae / hand_mvp / hand_teacher — VERDICT
# r3 item 1) run FIRST after the quality eval so their failure diagnosis
# (bench.py now persists rung stderr to runs/bench_logs/) lands early in
# the session, leaving time to fix and re-run. Each step is bounded and
# logs to /tmp/r4q_*.log.
set -u
cd /root/repo
export PYTHONHASHSEED=0

run() {  # run <tag> <timeout-s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a /tmp/r4q_status.log
  timeout "$to" "$@" > "/tmp/r4q_$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date +%H:%M:%S)" | tee -a /tmp/r4q_status.log
}

# 0. health gate: wait until the tunnel answers
for i in $(seq 1 60); do
  if timeout 120 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "TPU up at $(date)" | tee -a /tmp/r4q_status.log; break
  fi
  sleep 120
done

# 0b. if a prior quality training run is still in flight, wait for it
while [ -n "${WAIT_PID:-}" ] && kill -0 "$WAIT_PID" 2>/dev/null; do
  sleep 30
done

# 1. quality eval on the trained checkpoints (train ran separately)
run qtest 1800 python -m goliath_tpu.scripts.run_test \
    configs/rgca_synthetic_quality.yml

# 2. DIAGNOSIS rungs: the three models that have never banked a TPU number
run meshvae 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=mesh_vae \
    GOLIATH_BENCH_BATCH=4 python bench.py
run handmvp 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=hand_mvp \
    GOLIATH_BENCH_BATCH=4 python bench.py
run teacher 2400 env GOLIATH_BENCH_SINGLE=1 \
    GOLIATH_BENCH_MODEL=hand_teacher GOLIATH_BENCH_BATCH=1 python bench.py

# 3. RGCA + URHand rungs (prewarm the driver ladder's cache keys)
run b1 1500 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=1 \
    GOLIATH_RGCA_REMAT=0 python bench.py
run b4 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=4 \
    GOLIATH_RGCA_REMAT=0 python bench.py
run urhand 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=urhand \
    GOLIATH_BENCH_BATCH=1 python bench.py

# 4. banker rung prewarm
run banker 900 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_IMG_H=512 \
    GOLIATH_BENCH_IMG_W=512 GOLIATH_BENCH_UV=256 GOLIATH_BENCH_BATCH=1 \
    python bench.py

echo "QUEUE DONE $(date)" | tee -a /tmp/r4q_status.log
