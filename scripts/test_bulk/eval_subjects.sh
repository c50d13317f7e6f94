#!/bin/bash
# Per-subject bulk evaluation (replaces scripts/test_bulk/slurm_*.sh).
#   ./eval_subjects.sh <config.yml> <subjects.txt> [extra overrides...]
set -euo pipefail
CONFIG=$1; shift
SUBJECTS=$1; shift
while read -r SID; do
  [ -z "$SID" ] && continue
  echo "evaluating subject $SID"
  python -m goliath_tpu.scripts.run_test "$CONFIG" subject="$SID" "$@" \
    | tee "test_${SID}.log"
done < "$SUBJECTS"
