#!/usr/bin/env bash
# Round-5 battery, stage 3 — runs after round5_stage2.sh finishes:
# gate the morning's 40-epoch non-EMA baseline arm so the EMA A/B
# compares 40-vs-40 at identical seed/recipe through the same
# export-ladder gate (the committed gate_r4_embw1.json is the
# 100-epoch flagship and not a valid A/B baseline for a 40-epoch arm).
#
# Usage: tools/round5_stage3.sh <stage2_pid> <baseline_trainings_dir>
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python

WAIT_PID=${1:?usage: round5_stage3.sh <stage2_pid> <baseline dir>}
BASE_DIR=${2:?usage: round5_stage3.sh <stage2_pid> <baseline dir>}
DATA=${DATA:-_runs/synth512v6}
mkdir -p _runs/eval

echo "[r5s3] waiting for stage2 pid $WAIT_PID at $(date)"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "[r5s3] stage2 done at $(date)"
sleep 10

if [ -f "$BASE_DIR/model_best_csi.msgpack" ]; then
  echo "[r5s3] baseline-40 gate (checkpoint dir $BASE_DIR) at $(date)"
  timeout 5400 python tools/accuracy_gate.py \
    "$BASE_DIR/model_best_csi.msgpack" \
    --valid_dir $DATA/valid --train_dir $DATA/train \
    --labels labels.json --anchor_name stem \
    --out "_runs/eval/gate_r5_base40.json" \
    > "_runs/eval/gate_r5_base40.log" 2>&1
  echo "[r5s3] baseline-40 gate exit=$?"
else
  echo "[r5s3] no model_best_csi in $BASE_DIR; nothing to do"
fi
echo "[r5s3] done at $(date)"
