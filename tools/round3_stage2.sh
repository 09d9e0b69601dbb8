#!/usr/bin/env bash
# Round-3 stage 2: everything after the flagship v5 battery, chained so
# a dropped driver session cannot strand the TPU idle.
#
#   1. seed-B flagship run — same data/config, different training seed,
#      plus --eval_batch_size 8 (batched trainer validation): measures
#      run-to-run F1 noise (the error bar the gate deltas are judged
#      against) and the validation wall-clock drop.
#   2. accuracy gate on the seed-B checkpoint (full export ladder — a
#      second independent datapoint for the int8/.sdz F1 deltas).
#   3. slow-tier demonstration: warm run populates the pinned XLA
#      compile cache, timed rerun must clear the 10-minute wall
#      (VERDICT r2 weak #7).
#   4. host-RSS probe A/B: dispatch-only loop, default malloc vs
#      MALLOC_ARENA_MAX=2, to split glibc-arena retention from
#      backend-client retention (ROADMAP "next probes").
#
# Usage: tools/round3_stage2.sh [battery_pid]
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

DATA=${DATA:-_runs/synth512v5}
SEED_B=${SEED_B:-20260818}
BATTERY_PID="${1:-$(cat /tmp/battery.pid 2>/dev/null || echo '')}"

if [ -n "$BATTERY_PID" ]; then
  echo "[s2] waiting for battery ($BATTERY_PID)"
  while kill -0 "$BATTERY_PID" 2>/dev/null; do sleep 60; done
fi
echo "[s2] battery done at $(date)"

PRE_SEEDB_DIR="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
echo "[s2] stage 1: seed-B flagship run (seed=$SEED_B, eval_batch_size=8, supervised)"
# supervised + stall watchdog: a dropped tunnel RPC aborts in 15 min and
# auto-resumes from the last epoch checkpoint instead of stranding the
# chip (this exact failure hit the seed-A run at epoch 38)
bash tools/train_supervised.sh -n 5 -- \
  --train_dir $DATA/train --valid_dir $DATA/valid \
  --labels labels.json --anchor_name stem --hm_loss_fn focal \
  --batch_size 32 --epochs 100 --seed "$SEED_B" --eval_batch_size 8 \
  --stall_timeout_s 900 \
  > _runs/train_r3v5_seedB.log 2>&1 &
TRAIN_PID=$!
echo $TRAIN_PID > /tmp/train_seedB.pid
wait $TRAIN_PID
echo "[s2] seed-B training exit=$? at $(date)"
sleep 10

TRAIN_DIR="$(ls -d trainings/*/ 2>/dev/null | sort | tail -1)"
echo "[s2] stage 2: accuracy gate on $TRAIN_DIR"
# guard: only gate a directory the seed-B run actually produced — if its
# training crashed, the newest dir is seed-A's and gating it would
# silently duplicate the battery's numbers under a seed-B filename.
if [ -z "$TRAIN_DIR" ] || [ "$TRAIN_DIR" = "$PRE_SEEDB_DIR" ] || \
   [ ! -f "$TRAIN_DIR/model_best_kp_reg.msgpack" ]; then
  echo "[s2] FATAL: no new seed-B checkpoint (newest='$TRAIN_DIR', pre-run='$PRE_SEEDB_DIR'); skipping gate"
  TRAIN_DIR=""
fi
[ -n "$TRAIN_DIR" ] && timeout 5400 python tools/accuracy_gate.py "$TRAIN_DIR/model_best_kp_reg.msgpack" \
  --valid_dir $DATA/valid --train_dir $DATA/train \
  --labels labels.json --anchor_name stem \
  --out _runs/eval/gate_seedB_kp_reg.json \
  > _runs/eval/gate_seedB_kp_reg.log 2>&1
echo "[s2] seed-B gate exit=$?"

echo "[s2] stage 3: slow tier — warm run then timed rerun"
timeout 7200 bash tools/run_slow_tier.sh > _runs/slowtier_warm.log 2>&1
echo "[s2] warm run exit=$?"
T0=$(date +%s)
timeout 1200 bash tools/run_slow_tier.sh > _runs/slowtier_rerun.log 2>&1
RC=$?
T1=$(date +%s)
echo "[s2] timed rerun exit=$RC wall=$((T1 - T0))s"
echo "$((T1 - T0))" > _runs/slowtier_rerun_wall_s.txt

echo "[s2] stage 4: RSS probe A/B/C"
timeout 2400 python tools/probe_rss.py --steps 120 \
  > _runs/probe_rss_default.log 2>&1
echo "[s2] probe(default) exit=$?"
timeout 2400 env MALLOC_ARENA_MAX=2 python tools/probe_rss.py --steps 120 \
  > _runs/probe_rss_arena2.log 2>&1
echo "[s2] probe(arena2) exit=$?"
timeout 2400 python tools/probe_rss.py --steps 120 --malloc_trim \
  > _runs/probe_rss_trim.log 2>&1
echo "[s2] probe(trim) exit=$?"
echo "[s2] all stages done at $(date)"
