#!/bin/bash
# Per-subject bulk training on TPU hosts (replaces the reference's SLURM
# array jobs, scripts/train_bulk/slurm_heads.sh: one subject per GPU).
# Each subject's job is independent; give each its own TPU chip/slice by
# setting TPU_VISIBLE_DEVICES (or run on separate hosts).
#
#   ./launch_subjects.sh <config.yml> <subjects.txt> [extra overrides...]
#
# subjects.txt: one subject id per line.
set -euo pipefail
CONFIG=$1; shift
SUBJECTS=$1; shift
i=0
while read -r SID; do
  [ -z "$SID" ] && continue
  echo "launching subject $SID (device slot $i)"
  TPU_VISIBLE_DEVICES=$i \
    python -m goliath_tpu.scripts.run_train "$CONFIG" \
      subject="$SID" "$@" \
      > "train_${SID}.log" 2>&1 &
  i=$((i+1))
done < "$SUBJECTS"
wait
