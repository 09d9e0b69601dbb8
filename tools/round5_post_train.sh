#!/usr/bin/env bash
# Round-5 TPU battery — runs AFTER tools/regen_evidence.sh completes
# (stages serialize on the single-client TPU tunnel).
#
#   1. A/B arm: --ema 0.999          (40 epochs, vs the 40-epoch
#   2. A/B arm: --head_conv 64        baseline gate_r4_embw1.e40)
#   3. gates for both arms
#   4. train-step per-HLO ledger (batch 128)
#   5. Pallas top-k variant shootout (rounds vs onehot)
#   6. serve load test: --pipeline vs sync after the full-batch guard
#
# Usage: tools/round5_post_train.sh <flagship_trainings_dir>
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python

FLAGSHIP_DIR=${1:?usage: round5_post_train.sh <flagship trainings dir>}
DATA=${DATA:-_runs/synth512v6}
SEED=${SEED:-20260818}
AB_EPOCHS=${AB_EPOCHS:-40}
mkdir -p _runs/eval

run_arm () {  # name, extra flags...
  local name=$1; shift
  echo "[r5] arm $name ($AB_EPOCHS epochs) at $(date)"
  bash tools/train_supervised.sh -n 5 -- \
    --train_dir $DATA/train --valid_dir $DATA/valid \
    --labels labels.json --anchor_name stem --hm_loss_fn focal \
    --batch_size 32 --epochs "$AB_EPOCHS" --seed "$SEED" \
    --eval_batch_size 8 --embedding_weight 1.0 --stall_timeout_s 900 \
    --compile_cache _runs/xla-cache-train "$@" \
    > "_runs/train_r5_$name.log" 2>&1
  echo "[r5] arm $name train exit=$? at $(date)"
  local dir
  dir="$(ls -d trainings/*/ | sort | tail -1)"
  if [ ! -f "$dir/model_best_csi.msgpack" ]; then
    echo "[r5] arm $name: NO model_best_csi; skipping gate"; return 1
  fi
  echo "[r5] arm $name gate (checkpoint dir $dir)"
  timeout 5400 python tools/accuracy_gate.py \
    "$dir/model_best_csi.msgpack" \
    --valid_dir $DATA/valid --train_dir $DATA/train \
    --labels labels.json --anchor_name stem \
    --out "_runs/eval/gate_r5_$name.json" \
    > "_runs/eval/gate_r5_$name.log" 2>&1
  echo "[r5] arm $name gate exit=$?"
}

run_arm ema --ema 0.999
run_arm headconv --head_conv 64

echo "[r5] train-step HLO ledger at $(date)"
timeout 1800 python tools/trace_train_ledger.py 128 \
  --out _runs/train_ledger_b128.json \
  > _runs/train_ledger_b128.log 2>&1
echo "[r5] ledger exit=$?"

echo "[r5] Pallas top-k variant shootout at $(date)"
timeout 1800 python tools/bench_topk_variants.py \
  --out _runs/topk_variants.json > _runs/topk_variants.log 2>&1
echo "[r5] shootout exit=$?"

echo "[r5] load test: pipeline vs sync at $(date)"
( cd native && make -s ) || echo "[r5] WARN native build failed"
timeout 3600 python tools/load_test.py \
  --load_model "$FLAGSHIP_DIR/model_best_csi.msgpack" \
  --labels labels.json --anchor_name stem --sweep 32 \
  --clients 64 --duration 25 \
  --out _runs/load_test_r5_sync.json \
  > _runs/load_test_r5_sync.log 2>&1
echo "[r5] sync load test exit=$?"
timeout 3600 python tools/load_test.py \
  --load_model "$FLAGSHIP_DIR/model_best_csi.msgpack" \
  --labels labels.json --anchor_name stem --sweep 32 \
  --clients 64 --duration 25 \
  --out _runs/load_test_r5_pipeline.json \
  -- --pipeline \
  > _runs/load_test_r5_pipeline.log 2>&1
echo "[r5] pipeline load test exit=$?"
echo "[r5] done at $(date)"
