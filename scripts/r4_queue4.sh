#!/bin/bash
# Round-4 session-3 measurement queue. Runs from a FROZEN git snapshot of
# HEAD (session-2 lesson: bench rung subprocesses import half-edited
# modules when the working tree changes mid-queue). Rung order: the three
# never-banked model rungs first (hand_mvp now has the windowed march),
# then banker + RGCA/URHand prewarm for the driver ladder.
set -u
SNAP=/tmp/repo_snap
rm -rf "$SNAP"; mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
cd "$SNAP"
export PYTHONHASHSEED=0
echo "QUEUE4 snapshot $(git -C /root/repo rev-parse --short HEAD) $(date)" \
  | tee -a /tmp/r4q4_status.log

run() {  # run <tag> <timeout-s> <cmd...>
  local tag=$1 to=$2; shift 2
  echo "=== $tag start $(date +%H:%M:%S)" | tee -a /tmp/r4q4_status.log
  timeout "$to" "$@" > "/tmp/r4q4_$tag.log" 2>&1
  echo "=== $tag rc=$? end $(date +%H:%M:%S)" | tee -a /tmp/r4q4_status.log
}

# health gate
for i in $(seq 1 30); do
  if timeout 120 python -c "import jax; jax.devices()" 2>/dev/null; then
    echo "TPU up at $(date)" | tee -a /tmp/r4q4_status.log; break
  fi
  sleep 60
done

run handmvp 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=hand_mvp \
    GOLIATH_BENCH_BATCH=4 JAX_TRACEBACK_FILTERING=off python bench.py
run meshvae 2400 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=mesh_vae \
    GOLIATH_BENCH_BATCH=4 JAX_TRACEBACK_FILTERING=off python bench.py
run teacher 2400 env GOLIATH_BENCH_SINGLE=1 \
    GOLIATH_BENCH_MODEL=hand_teacher GOLIATH_BENCH_BATCH=1 \
    JAX_TRACEBACK_FILTERING=off python bench.py
run banker 900 env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_IMG_H=512 \
    GOLIATH_BENCH_IMG_W=512 GOLIATH_BENCH_UV=256 GOLIATH_BENCH_BATCH=1 \
    python bench.py

echo "QUEUE4 DONE $(date)" | tee -a /tmp/r4q4_status.log
