#!/usr/bin/env bash
# The FULL test matrix in one command: fast tier (default `pytest`
# deselects the slow marker) followed by the slow tier (trainer
# integration, multihost subprocess, export suites) with the pinned
# persistent XLA compilation cache (tools/run_slow_tier.sh).
#
#   bash tools/run_full_matrix.sh [extra pytest args]
#
# Exit code is non-zero if EITHER tier fails.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== fast tier (pytest -m 'not slow') ==="
python -m pytest tests/ -q "$@"
fast_rc=$?

echo "=== slow tier (pytest -m slow, pinned XLA cache) ==="
bash tools/run_slow_tier.sh "$@"
slow_rc=$?

echo "=== matrix: fast rc=$fast_rc slow rc=$slow_rc ==="
exit $(( fast_rc || slow_rc ))
