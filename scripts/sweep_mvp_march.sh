#!/bin/bash
# r5: march config sweep (each in a fresh process; env knobs are read at
# import/trace time). Uses probe_mvp_march.py full mode only.
cd /root/repo
run() {
  echo "==== $1 ===="
  shift
  env GOLIATH_PROBE_MODES=full "$@" timeout 1200 python scripts/probe_mvp_march.py 2>/dev/null
}
run baseline
run no_chunk_ckpt   GOLIATH_MVP_NO_CKPT=1
run no_group_ckpt   GOLIATH_MVP_NO_GRP_CKPT=1
run no_ckpt_at_all  GOLIATH_MVP_NO_CKPT=1 GOLIATH_MVP_NO_GRP_CKPT=1
run tg64            GOLIATH_PROBE_TILEGROUP=64
run tg128           GOLIATH_PROBE_TILEGROUP=128
run chunk32         GOLIATH_PROBE_CHUNK=32
run S64             GOLIATH_PROBE_STEPS=64
