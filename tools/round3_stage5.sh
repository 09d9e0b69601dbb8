#!/usr/bin/env bash
# Round-3 stage-5: after the stage-4 battery releases the chip, sweep
# the headline bench batch size (int8 static, 128/192/256) to confirm
# the shipping config, then one final headline sanity run at the
# default. Chained off the stage-4 pid so a dropped session can't
# strand the chip idle or collide on the single-client tunnel.
set -uo pipefail
cd "$(dirname "$0")/.."
export PYTHONPATH="$(pwd)${PYTHONPATH:+:$PYTHONPATH}"

while [ -f /tmp/stage4.pid ] && kill -0 "$(cat /tmp/stage4.pid)" 2>/dev/null; do
  sleep 60
done
echo "[s5] stage-4 done at $(date)"
sleep 10

for B in 128 192 256; do
  echo "[s5] bench --batch $B"
  timeout 1800 python bench.py --batch $B > _runs/bench_b${B}_r3.json 2>_runs/bench_b${B}_r3.log
  echo "[s5] exit=$? $(cat _runs/bench_b${B}_r3.json 2>/dev/null)"
done
echo "[s5] done at $(date)"
