#!/usr/bin/env bash
# Round-3 stage-3 battery (serialized on the single-client TPU tunnel):
#   1. conf_threshold sweep on the seed-B v5 best checkpoint — locates
#      the operating point of the strongest trained model this round.
#   2. RSS probe A/B/C re-run (tools/probe_rss.py shipped round 3 with a
#      float grid-size bug; fixed) — splits the trainer host-RSS growth
#      between native retention and glibc arenas (ROADMAP.md).
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

CKPT=${CKPT:-trainings/2026-08-18_16-31-56/model_best_kp_reg.msgpack}
DATA=${DATA:-_runs/synth512v5}

echo "[s3] stage 1: conf sweep on $CKPT at $(date)"
timeout 3600 python - > _runs/eval/sweep_seedB.log 2>&1 <<'EOF'
from structuredetector_tpu.cli import evaluate
evaluate.main([
    "--valid_dir", "_runs/synth512v5/valid",
    "--load_model", "trainings/2026-08-18_16-31-56/model_best_kp_reg.msgpack",
    "--labels", "labels.json", "--anchor_name", "stem",
    "--eval_batch_size", "8",
    "--conf_sweep", "0.2,0.25,0.3,0.4,0.5",
    "--save_summary", "_runs/eval/sweep_seedB.json",
])
EOF
echo "[s3] sweep exit=$?"

for ARM in default arena2 trim; do
  echo "[s3] stage 2: rss probe ($ARM) at $(date)"
  ENV=""; FLAGS=""
  case $ARM in
    arena2) ENV="MALLOC_ARENA_MAX=2" ;;
    trim)   FLAGS="--malloc_trim" ;;
  esac
  env $ENV timeout 2400 python tools/probe_rss.py --steps 120 --batch 32 \
    --size 512 $FLAGS > _runs/probe_rss_${ARM}.log 2>&1
  echo "[s3] probe($ARM) exit=$?"
done
echo "[s3] all stages done at $(date)"
