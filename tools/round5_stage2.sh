#!/usr/bin/env bash
# Round-5 battery, stage 2 — reordered from round5_post_train.sh so the
# cheap, high-value measurement stages run BEFORE any second training
# arm (the 40-epoch arms run ~2h each through the tunnel; the round may
# not have room for two, and the ledger / top-k shootout / pipeline
# load test each close a VERDICT r4 item on their own).
#
#   0. wait for the in-flight --ema arm (PID file or process scan-free
#      poll on the supervisor PID passed as $2)
#   1. train-step per-HLO ledger (batch 128)
#   2. Pallas top-k variant shootout (rounds vs onehot)
#   3. serve load test: sync vs --pipeline after the full-batch guard
#   4. accuracy gate for the EMA arm
#
# Usage: tools/round5_stage2.sh <flagship_trainings_dir> <supervisor_pid>
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"
export PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python

FLAGSHIP_DIR=${1:?usage: round5_stage2.sh <flagship trainings dir> <pid>}
WAIT_PID=${2:?usage: round5_stage2.sh <flagship trainings dir> <pid>}
DATA=${DATA:-_runs/synth512v6}
mkdir -p _runs/eval
# Pin the EMA arm's dir NOW (it is the newest trainings/ entry while its
# training is still in flight) — discovering it after the measurement
# stages would race with any arm launched in the meantime.
EMA_DIR="$(ls -d trainings/*/ | sort | tail -1)"

echo "[r5s2] waiting for training supervisor pid $WAIT_PID at $(date)"
while kill -0 "$WAIT_PID" 2>/dev/null; do sleep 20; done
echo "[r5s2] training done at $(date)"
sleep 10  # let the trainer's device client tear down the tunnel slot

echo "[r5s2] train-step HLO ledger at $(date)"
timeout 1800 python tools/trace_train_ledger.py 128 \
  --out _runs/train_ledger_b128.json \
  > _runs/train_ledger_b128.log 2>&1
echo "[r5s2] ledger exit=$?"

echo "[r5s2] Pallas top-k variant shootout at $(date)"
timeout 1800 python tools/bench_topk_variants.py \
  --out _runs/topk_variants.json > _runs/topk_variants.log 2>&1
echo "[r5s2] shootout exit=$?"

echo "[r5s2] load test: sync vs pipeline at $(date)"
( cd native && make -s ) || echo "[r5s2] WARN native build failed"
timeout 3600 python tools/load_test.py \
  --load_model "$FLAGSHIP_DIR/model_best_csi.msgpack" \
  --labels labels.json --anchor_name stem --sweep 32 \
  --clients 64 --duration 25 \
  --out _runs/load_test_r5_sync.json \
  > _runs/load_test_r5_sync.log 2>&1
echo "[r5s2] sync load test exit=$?"
timeout 3600 python tools/load_test.py \
  --load_model "$FLAGSHIP_DIR/model_best_csi.msgpack" \
  --labels labels.json --anchor_name stem --sweep 32 \
  --clients 64 --duration 25 \
  --out _runs/load_test_r5_pipeline.json \
  -- --pipeline_force \
  > _runs/load_test_r5_pipeline.log 2>&1
echo "[r5s2] pipeline load test exit=$?"

if [ -f "$EMA_DIR/model_best_csi.msgpack" ]; then
  echo "[r5s2] EMA arm gate (checkpoint dir $EMA_DIR) at $(date)"
  timeout 5400 python tools/accuracy_gate.py \
    "$EMA_DIR/model_best_csi.msgpack" \
    --valid_dir $DATA/valid --train_dir $DATA/train \
    --labels labels.json --anchor_name stem \
    --out "_runs/eval/gate_r5_ema.json" \
    > "_runs/eval/gate_r5_ema.log" 2>&1
  echo "[r5s2] EMA gate exit=$?"
else
  echo "[r5s2] EMA arm: NO model_best_csi in $EMA_DIR; skipping gate"
fi
echo "[r5s2] done at $(date)"
