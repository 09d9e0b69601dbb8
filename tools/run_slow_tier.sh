#!/usr/bin/env bash
# Run the slow test tier with a *persistent* XLA compilation cache.
#
# The slow tier is compile-dominated on a 1-core host (~39 min cold: 68
# tests averaging ~35 s, most of it XLA compiles of per-test train/eval
# steps). tests/conftest.py deliberately uses a fresh per-run cache dir
# so that cross-host CPU-feature drift can never feed a stale kernel to
# a different ISA (DESIGN.md "Compilation strategy"); pinning the dir is
# the supported opt-in for same-host reruns, which is exactly the gate
# use case. First run warms the cache; reruns skip every unchanged
# compile and finish well under the 10-minute wall.
#
# Usage: tools/run_slow_tier.sh [extra pytest args...]
#   SDNET_XLA_CACHE=/path overrides the cache location.
set -euo pipefail
cd "$(dirname "$0")/.."
CACHE="${SDNET_XLA_CACHE:-_runs/xla-cache-slowtier}"
mkdir -p "$CACHE"
export JAX_COMPILATION_CACHE_DIR="$CACHE"
exec python -m pytest tests/ -m slow -q -p no:cacheprovider --durations=10 "$@"
