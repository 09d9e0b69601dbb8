#!/usr/bin/env bash
# Round-3 measurement battery: runs automatically once the flagship
# training process (/tmp/train.pid) exits, so a dropped driver session
# cannot strand the TPU idle. Each stage logs under _runs/ and failures
# don't abort later stages.
#
# Stages (all on the real chip):
#   1. accuracy gate  — evaluate CLI on the trained checkpoint, then
#      convert_export + evaluate_export for float/.int8 .sdz modes;
#      one F1 table with deltas (VERDICT r2 next-round #1 + #2).
#   2. batch-1 latency breakdown (VERDICT #6).
#   3. serving load test, percentile sweep over --max_batch (VERDICT #7).
#   4. bench.py headline sanity run (driver runs it again at round end).
#
# Usage: tools/round3_post_train.sh [training_dir] (default: newest)
set -uo pipefail
cd "$(dirname "$0")/.."
# tools are run as `python tools/x.py`; make the package importable regardless
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:-_runs/synth512v5}
echo "[post] waiting for training ($(cat /tmp/train.pid 2>/dev/null || echo '?')) to finish"

while [ -f /tmp/train.pid ] && kill -0 "$(cat /tmp/train.pid)" 2>/dev/null; do
  sleep 60
done
echo "[post] training done at $(date)"
sleep 10  # let the final checkpoint writes settle

# resolve the training dir AFTER the run finishes — it does not exist
# when this watchdog is launched alongside the training process
TRAIN_DIR="${1:-$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)}"
echo "[post] train_dir=$TRAIN_DIR"

# If training died before writing any checkpoint (e.g. a backend-init
# failure: the tunneled TPU is single-client, so a concurrent JAX
# process kills startup), bail out instead of gating against nothing.
if [ -z "$TRAIN_DIR" ] || [ ! -f "$TRAIN_DIR/model_best_kp_reg.msgpack" ]; then
  echo "[post] FATAL: no checkpoint under '${TRAIN_DIR:-<none>}' — training failed; aborting battery"
  exit 1
fi

# Gate BOTH conditional checkpoints: model_best_classif is the
# reference's pick (README.md:27-30) but tracks a metric that only
# moves once anchors classify; model_best_kp_reg tracks total keypoint
# F1 and is the best overall detector if classification stalls.
for NAME in classif kp_reg; do
  CKPT="$TRAIN_DIR/model_best_$NAME.msgpack"
  echo "[post] stage 1: accuracy gate ($NAME)"
  timeout 5400 python tools/accuracy_gate.py "$CKPT" \
    --valid_dir $DATA/valid --train_dir $DATA/train \
    --labels labels.json --anchor_name stem \
    --out _runs/eval/gate_${NAME}.json \
    > _runs/eval/gate_${NAME}.log 2>&1
  echo "[post] gate($NAME) exit=$?"
done

# Per-species anchor-confidence probe (window-max sigmoid at GT stem
# locations): localizes whether each species' own channel dominates at
# its anchors — the diagnostic that drove datasets v4 and v5.
echo "[post] stage 1.5: per-species anchor probe"
timeout 1800 python tools/probe_anchor_conf.py \
  "$TRAIN_DIR/model_best_kp_reg.msgpack" \
  --valid_dir $DATA/valid --labels labels.json --anchor_name stem \
  --out _runs/eval/probe_anchor.json \
  > _runs/eval/probe_anchor.log 2>&1
echo "[post] probe exit=$?"

echo "[post] stage 2: batch-1 breakdown"
timeout 1800 python tools/bench_batch1.py --batch 1 --steps 200 \
  > _runs/bench_batch1_r3.log 2>&1
echo "[post] batch1 exit=$?"

echo "[post] stage 3: load-test sweep"
CKPT="$TRAIN_DIR/model_best_kp_reg.msgpack"
timeout 3600 python tools/load_test.py --load_model "$CKPT" \
  --labels labels.json --anchor_name stem \
  --clients 64 --duration 30 --sweep 8,32,128 \
  --out _runs/load_test_r3.json \
  > _runs/load_test_r3.log 2>&1
echo "[post] load_test exit=$?"

echo "[post] stage 4: bench.py headline"
timeout 1800 python bench.py > _runs/bench_headline_r3.json 2>_runs/bench_headline_r3.log
echo "[post] bench exit=$?"
echo "[post] all stages done at $(date)"
