#!/usr/bin/env bash
# Round-4 battery: CSI triage A/B.
#
# The round-3 verdict's top item: CSI F1 ~0.02-0.05 while keypoint F1 is
# ~0.99. Round-4 diagnosis (DESIGN.md "Structural grouping"): the
# embedding head never trains at the reference's embedding_weight=1e-3 —
# its raw L1 stays at the ~19-grid-cell do-nothing plateau (= mean
# leaf->stem displacement of the dataset), so part origins miss the
# 12.8-cell association gate and predicted objects carry ZERO parts.
# Arm A (control, reference default) reproduces the failure; arm B
# raises --embedding_weight to 1.0.
#
# Stages (serialized on the single-client tunnel):
#   1. wait for the running control train; gate it (floors expected FAIL)
#   2. train arm B (--embedding_weight 1.0); gate it (floors must PASS)
#   3. oracle arms C/D on arm-B checkpoint (isolate remaining error)
#   4. serve load test (native request decode) + batch-1 bench
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:-_runs/synth512v6}
SEED=${SEED:-20260818}
mkdir -p _runs/eval

CONTROL_PID=$(cat /tmp/train_v6.pid 2>/dev/null || true)
if [ -n "$CONTROL_PID" ]; then
  echo "[r4] waiting for control run pid=$CONTROL_PID at $(date)"
  while kill -0 "$CONTROL_PID" 2>/dev/null; do sleep 20; done
fi
CONTROL_DIR="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
echo "[r4] control dir: $CONTROL_DIR"

echo "[r4] stage 1: gate the control (expected FAIL on structural floors)"
timeout 5400 python tools/accuracy_gate.py \
  "$CONTROL_DIR/model_best_kp_reg.msgpack" \
  --valid_dir $DATA/valid --train_dir $DATA/train \
  --labels labels.json --anchor_name stem \
  --out _runs/eval/gate_r4_control.json \
  > _runs/eval/gate_r4_control.log 2>&1
echo "[r4] control gate exit=$? (non-zero expected)"

echo "[r4] stage 2: arm B train (--embedding_weight 1.0) at $(date)"
bash tools/train_supervised.sh -n 5 -- \
  --train_dir $DATA/train --valid_dir $DATA/valid \
  --labels labels.json --anchor_name stem --hm_loss_fn focal \
  --batch_size 32 --epochs 100 --seed "$SEED" --eval_batch_size 8 \
  --embedding_weight 1.0 --stall_timeout_s 900 \
  --compile_cache _runs/xla-cache-train \
  > _runs/train_r4_embw1.log 2>&1
echo "[r4] arm B train exit=$? at $(date)"

FIX_DIR="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
# Check the checkpoint stages 2b/3/4 actually consume: model_best_csi
# is only written once CSI exceeds 0.0, so an arm-B run whose grouping
# never trains must FAIL here with a diagnosis, not crash downstream.
if [ "$FIX_DIR" = "$CONTROL_DIR" ] || [ ! -f "$FIX_DIR/model_best_csi.msgpack" ]; then
  echo "[r4] FATAL: arm B produced no model_best_csi checkpoint" \
       "(CSI never rose above 0.0 — the grouping fix did not take," \
       "or training died; see _runs/train_r4_embw1.log)"; exit 1
fi
echo "[r4] arm B dir: $FIX_DIR"

echo "[r4] stage 2b: gate arm B (floors must PASS)"
timeout 5400 python tools/accuracy_gate.py \
  "$FIX_DIR/model_best_csi.msgpack" \
  --valid_dir $DATA/valid --train_dir $DATA/train \
  --labels labels.json --anchor_name stem \
  --out _runs/eval/gate_r4_embw1.json \
  > _runs/eval/gate_r4_embw1.log 2>&1
echo "[r4] arm B gate exit=$?"

echo "[r4] stage 3: oracle arms C/D on arm B"
timeout 5400 python tools/oracle_grouping.py --arms CD \
  --valid_dir $DATA/valid --labels labels.json --anchor_name stem \
  --load_model "$FIX_DIR/model_best_csi.msgpack" \
  --conf_threshold 0.4 \
  --out _runs/eval/oracle_r4_CD.json \
  > _runs/eval/oracle_r4_CD.log 2>&1
echo "[r4] oracle exit=$?"

echo "[r4] stage 4: serve load test (native decode) + conf sweep"
timeout 3600 python tools/load_test.py \
  --load_model "$FIX_DIR/model_best_csi.msgpack" \
  --labels labels.json --anchor_name stem --sweep 8,32,64 \
  --out _runs/load_test_r4.json \
  > _runs/load_test_r4.log 2>&1
echo "[r4] load test exit=$?"

timeout 3600 python - > _runs/eval/sweep_r4.log 2>&1 <<PYEOF
from structuredetector_tpu.cli import evaluate
evaluate.main([
    "--valid_dir", "$DATA/valid",
    "--load_model", "$FIX_DIR/model_best_csi.msgpack",
    "--labels", "labels.json", "--anchor_name", "stem",
    "--eval_batch_size", "8",
    "--conf_sweep", "0.2,0.25,0.3,0.4,0.5",
    "--save_summary", "_runs/eval/sweep_r4.json",
])
PYEOF
echo "[r4] sweep exit=$?"
echo "[r4] battery done at $(date)"
