#!/bin/bash
# Sequential TPU work queue for round-3 measurements. Each step is bounded
# and logs to /tmp/r3q_*.log; designed to be fired as soon as the axon
# tunnel recovers and left alone.
set -u
cd /root/repo
export PYTHONHASHSEED=0

run() {  # run <tag> <timeout-s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a /tmp/r3q_status.log
  timeout "$to" "$@" > "/tmp/r3q_$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date +%H:%M:%S)" | tee -a /tmp/r3q_status.log
}

# 0. health gate: wait until the tunnel answers
for i in $(seq 1 60); do
  if timeout 120 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "TPU up at $(date)" | tee -a /tmp/r3q_status.log; break
  fi
  sleep 120
done

# 1. quality-parity training + eval (the round's top evidence artifact)
rm -rf runs/rgca.SYNTHQ
run qtrain 4500 python -m goliath_tpu.scripts.run_train \
    configs/rgca_synthetic_quality.yml
run qtest 1800 python -m goliath_tpu.scripts.run_test \
    configs/rgca_synthetic_quality.yml

# 2. RGCA bench rungs with the new binning/reduce (also prewarms the cache)
run b1 1500 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=1 \
    GOLIATH_RGCA_REMAT=0 python bench.py
run b4 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_BATCH=4 \
    GOLIATH_RGCA_REMAT=0 python bench.py

# 3. extra models, reference scale (driver-visible rungs; prewarm)
run urhand 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=urhand \
    GOLIATH_BENCH_BATCH=1 python bench.py
run meshvae 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=mesh_vae \
    GOLIATH_BENCH_BATCH=4 python bench.py
run handmvp 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=hand_mvp \
    GOLIATH_BENCH_BATCH=4 python bench.py
run teacher 2400 env GOLIATH_BENCH_SINGLE=1 \
    GOLIATH_BENCH_MODEL=hand_teacher GOLIATH_BENCH_BATCH=1 python bench.py

# 4. banker rung prewarm
run banker 900 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_IMG_H=512 \
    GOLIATH_BENCH_IMG_W=512 GOLIATH_BENCH_UV=256 GOLIATH_BENCH_BATCH=1 \
    python bench.py

echo "QUEUE DONE $(date)" | tee -a /tmp/r3q_status.log
