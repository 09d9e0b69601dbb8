#!/usr/bin/env bash
# Round-5 battery, stage 4 — the --head_conv A/B arm (the second knob
# VERDICT r4 weak-1 called out; --ema ran as stage 1/2). 40 epochs,
# identical seed/recipe to the stage-3 baseline gate
# (_runs/eval/gate_r5_base40.json), then the export-ladder gate.
#
# Usage: tools/round5_stage4.sh
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python

DATA=${DATA:-_runs/synth512v6}
SEED=${SEED:-20260818}
mkdir -p _runs/eval

echo "[r5s4] headconv arm (40 epochs) at $(date)"
bash tools/train_supervised.sh -n 5 -- \
  --train_dir $DATA/train --valid_dir $DATA/valid \
  --labels labels.json --anchor_name stem --hm_loss_fn focal \
  --batch_size 32 --epochs 40 --seed "$SEED" \
  --eval_batch_size 8 --embedding_weight 1.0 --stall_timeout_s 900 \
  --compile_cache _runs/xla-cache-train --head_conv 64 \
  > _runs/train_r5_headconv.log 2>&1
echo "[r5s4] train exit=$? at $(date)"
ARM_DIR="$(ls -d trainings/*/ | sort | tail -1)"
if [ -f "$ARM_DIR/model_best_csi.msgpack" ]; then
  echo "[r5s4] headconv gate (checkpoint dir $ARM_DIR) at $(date)"
  timeout 5400 python tools/accuracy_gate.py \
    "$ARM_DIR/model_best_csi.msgpack" \
    --valid_dir $DATA/valid --train_dir $DATA/train \
    --labels labels.json --anchor_name stem \
    --out "_runs/eval/gate_r5_headconv.json" \
    > "_runs/eval/gate_r5_headconv.log" 2>&1
  echo "[r5s4] gate exit=$?"
else
  echo "[r5s4] NO model_best_csi in $ARM_DIR; skipping gate"
fi
echo "[r5s4] done at $(date)"
