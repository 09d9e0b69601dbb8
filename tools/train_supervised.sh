#!/usr/bin/env bash
# Supervised training: relaunch on stall-abort with exact resume.
#
# Pairs with `train --stall_timeout_s N` (exit code 87 when a device RPC
# wedges): every abnormal exit is retried with `--resume <run dir>` so a
# flaky transport costs seconds of progress, not the run. Exit 0 and
# exhausted retries both end the loop.
#
# Usage:
#   tools/train_supervised.sh [-n MAX_RESTARTS] -- <train args...>
#
# Example:
#   tools/train_supervised.sh -n 5 -- \
#     --train_dir data/train --valid_dir data/valid --labels labels.json \
#     --anchor_name stem --epochs 100 --stall_timeout_s 900
set -uo pipefail
# stay in the caller's cwd — trainings/<ts>/ lands where a direct
# `train` invocation would put it; only the import path points home
REPO_ROOT="$(cd "$(dirname "$0")/.." && pwd)"
export PYTHONPATH="$REPO_ROOT${PYTHONPATH:+:$PYTHONPATH}"

MAX_RESTARTS=5
while getopts "n:" opt; do
  case "$opt" in
    n) MAX_RESTARTS="$OPTARG" ;;
    *) echo "usage: $0 [-n MAX_RESTARTS] -- <train args...>" >&2; exit 2 ;;
  esac
done
shift $((OPTIND - 1))
[ "${1:-}" = "--" ] && shift

attempt=0
RESUME_DIR=""
while :; do
  attempt=$((attempt + 1))
  if [ -n "$RESUME_DIR" ]; then
    echo "[supervise] attempt $attempt: resuming $RESUME_DIR at $(date)"
    python -m structuredetector_tpu.cli.train "$@" --resume "$RESUME_DIR"
  else
    echo "[supervise] attempt $attempt: fresh run at $(date)"
    PRE_DIRS="$(ls -d trainings/*/ 2>/dev/null | sort)"
    python -m structuredetector_tpu.cli.train "$@"
  fi
  RC=$?
  [ "$RC" -eq 0 ] && { echo "[supervise] finished cleanly"; exit 0; }
  echo "[supervise] train exited rc=$RC at $(date)"

  # find this run's dir: on the first attempt, the one that appeared;
  # afterwards, keep resuming the same dir
  if [ -z "$RESUME_DIR" ]; then
    RESUME_DIR="$(comm -13 <(echo "$PRE_DIRS") \
                           <(ls -d trainings/*/ 2>/dev/null | sort) | tail -1)"
  fi
  # a resumable run must have at least one full-state checkpoint
  if [ -z "$RESUME_DIR" ] || [ ! -d "$RESUME_DIR/state" ] || \
     [ -z "$(ls "$RESUME_DIR/state" 2>/dev/null | grep -v tmp)" ]; then
    echo "[supervise] no resumable checkpoint (dir='$RESUME_DIR'); will start fresh"
    RESUME_DIR=""
  fi
  if [ "$attempt" -gt "$MAX_RESTARTS" ]; then
    echo "[supervise] giving up after $attempt attempts"
    exit "$RC"
  fi
  sleep 15  # let the far side drop the dead session before reconnecting
done
