#!/usr/bin/env bash
# Round-3 stage-4: scale the data axis. CSI/classif demand exact
# structures and behave like a product of per-keypoint successes
# (DESIGN.md "Flagship accuracy gate"); with the v5 geometry solved
# (seed-B anchor F1 0.814), training-set size is the remaining lever
# this sandbox allows (real data + ImageNet warm start are
# egress-blocked). 4x the images, same generator, then the standard
# supervised flagship run + gate + sweep.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:-_runs/synth512v6}
SEED=${SEED:-20260818}

if [ ! -f "$DATA/train/im_1199.json" ]; then
  echo "[s4] generating $DATA (1200/100) at $(date)"
  timeout 3600 python tools/make_synthetic_dataset.py "$DATA" \
    --train 1200 --valid 100 > _runs/make_dataset_v6.log 2>&1
  echo "[s4] dataset exit=$?"
fi

PRE_DIR="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
echo "[s4] flagship run on $DATA (seed=$SEED) at $(date)"
bash tools/train_supervised.sh -n 5 -- \
  --train_dir $DATA/train --valid_dir $DATA/valid \
  --labels labels.json --anchor_name stem --hm_loss_fn focal \
  --batch_size 32 --epochs 100 --seed "$SEED" --eval_batch_size 8 \
  --stall_timeout_s 900 \
  > _runs/train_r3v6.log 2>&1 &
TRAIN_PID=$!
echo $TRAIN_PID > /tmp/train_v6.pid
wait $TRAIN_PID
echo "[s4] training exit=$? at $(date)"
sleep 10

TRAIN_DIR="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
if [ -z "$TRAIN_DIR" ] || [ "$TRAIN_DIR" = "$PRE_DIR" ] || \
   [ ! -f "$TRAIN_DIR/model_best_kp_reg.msgpack" ]; then
  echo "[s4] FATAL: no new checkpoint (newest='$TRAIN_DIR'); aborting"
  exit 1
fi

echo "[s4] accuracy gate on $TRAIN_DIR"
timeout 5400 python tools/accuracy_gate.py \
  "$TRAIN_DIR/model_best_kp_reg.msgpack" \
  --valid_dir $DATA/valid --train_dir $DATA/train \
  --labels labels.json --anchor_name stem \
  --out _runs/eval/gate_v6_kp_reg.json \
  > _runs/eval/gate_v6_kp_reg.log 2>&1
echo "[s4] gate exit=$?"

echo "[s4] conf sweep"
timeout 3600 python - > _runs/eval/sweep_v6.log 2>&1 <<EOF
from structuredetector_tpu.cli import evaluate
evaluate.main([
    "--valid_dir", "$DATA/valid",
    "--load_model", "$TRAIN_DIR/model_best_kp_reg.msgpack",
    "--labels", "labels.json", "--anchor_name", "stem",
    "--eval_batch_size", "8",
    "--conf_sweep", "0.2,0.25,0.3,0.4,0.5",
    "--save_summary", "_runs/eval/sweep_v6.json",
])
EOF
echo "[s4] sweep exit=$?"
echo "[s4] done at $(date)"
