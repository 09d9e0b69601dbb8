#!/usr/bin/env bash
# Round-3 stage-6: measure --ema on hardware. Two identical short
# flagship-config runs (256x256, 30 epochs, v5 300-image set, same
# seed) differing only in --ema 0.98, then `evaluate` both best
# keypoint checkpoints under identical conditions. Small-data noisy
# training is exactly where weight averaging should show up.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:-_runs/synth512v5}

while [ -f /tmp/stage5.pid ] && kill -0 "$(cat /tmp/stage5.pid)" 2>/dev/null; do
  sleep 60
done
echo "[s6] stage-5 done at $(date)"
sleep 10

declare -A DIRS
for ARM in base ema; do
  EXTRA=""
  [ "$ARM" = ema ] && EXTRA="--ema 0.98"
  PRE="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
  echo "[s6] training arm=$ARM at $(date)"
  timeout 3600 bash tools/train_supervised.sh -n 3 -- \
    --train_dir $DATA/train --valid_dir $DATA/valid \
    --labels labels.json --anchor_name stem --hm_loss_fn focal \
    --width 256 --height 256 --batch_size 32 --epochs 30 \
    --seed 20260818 --eval_batch_size 8 --stall_timeout_s 600 $EXTRA \
    > _runs/train_ema_${ARM}.log 2>&1
  NEW="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
  if [ -z "$NEW" ] || [ "$NEW" = "$PRE" ]; then
    echo "[s6] FATAL: arm=$ARM produced no run dir"; exit 1
  fi
  DIRS[$ARM]="$NEW"
  echo "[s6] arm=$ARM dir=$NEW"
done

for ARM in base ema; do
  echo "[s6] evaluate arm=$ARM"
  timeout 1800 python - > _runs/eval/ema_${ARM}.log 2>&1 <<EOF
from structuredetector_tpu.cli import evaluate
evaluate.main([
    "--valid_dir", "$DATA/valid",
    "--load_model", "${DIRS[$ARM]}model_best_kp_reg.msgpack",
    "--labels", "labels.json", "--anchor_name", "stem",
    "--width", "256", "--height", "256",
    "--eval_batch_size", "8",
    "--save_summary", "_runs/eval/ema_${ARM}.json",
])
EOF
  echo "[s6] eval($ARM) exit=$?"
done

python - <<'EOF'
import json
for arm in ("base", "ema"):
    s = json.load(open(f"_runs/eval/ema_{arm}.json"))
    print(f"{arm}: anchor F1 {s.get('anchor/f1_total', 0):.4f}  "
          f"part F1 {s.get('part/f1_total', 0):.4f}  "
          f"kps F1 {s.get('kps/f1_total', 0):.4f}")
EOF
echo "[s6] done at $(date)"
