#!/bin/bash
# r5: find smallest hand_teacher/hand_mvp crash repro + pallas on/off split.
cd /root/repo
probe() {
  for i in $(seq 1 12); do
    if timeout 150 python -c "import jax; jax.devices()" 2>/dev/null >/dev/null; then
      echo "== device healthy"; return 0
    fi
    echo "== device unhealthy, waiting 60s ($i)"; sleep 60
  done
  echo "== device DEAD, aborting"; exit 1
}
rung() {
  local tag="$1"; local model="$2"; shift 2
  echo "==== rung $tag ===="
  env GOLIATH_BENCH_SINGLE=1 GOLIATH_BENCH_MODEL=$model \
      GOLIATH_BENCH_BATCH=1 GOLIATH_BENCH_STEPS=3 \
      PYTHONHASHSEED=0 JAX_TRACEBACK_FILTERING=off "$@" \
      timeout 900 python bench.py 2>runs/bench_logs/bisect2_${tag}.stderr
  echo "==== rung $tag rc=$? ===="
  tail -2 runs/bench_logs/bisect2_${tag}.stderr
  probe
}
probe
rung t_small_pl1 hand_teacher GOLIATH_BENCH_PALLAS=1 GOLIATH_BENCH_IMG_H=512 GOLIATH_BENCH_IMG_W=336 GOLIATH_BENCH_UV=256
rung t_quarter_pl1 hand_teacher GOLIATH_BENCH_PALLAS=1 GOLIATH_BENCH_IMG_H=1024 GOLIATH_BENCH_IMG_W=672 GOLIATH_BENCH_UV=512
rung t_quarter_pl0 hand_teacher GOLIATH_BENCH_PALLAS=0 GOLIATH_BENCH_IMG_H=1024 GOLIATH_BENCH_IMG_W=672 GOLIATH_BENCH_UV=512
rung m_quarter_pl1 hand_mvp GOLIATH_BENCH_PALLAS=1 GOLIATH_BENCH_IMG_H=1024 GOLIATH_BENCH_IMG_W=672 GOLIATH_BENCH_UV=512
