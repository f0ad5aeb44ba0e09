#!/usr/bin/env bash
# Pre-push gate: the fast contract checks a push must pass before CI.
# Counterpart of the reference's scripts/run_prepush_gate.sh.
# Usage: scripts/run_prepush_gate.sh [--full]
#   default: boundary lint + type completeness + architecture contracts
#   --full : additionally runs the unit suite
set -euo pipefail
cd "$(dirname "$0")/.."

echo "[prepush] import boundary"
python scripts/check_public_internal_imports.py

echo "[prepush] type completeness"
JAX_PLATFORMS=cpu python scripts/check_type_completeness.py

echo "[prepush] architecture contracts"
python -m pytest tests/suites/integration/architecture/ -q --no-header

if [[ "${1:-}" == "--full" ]]; then
  echo "[prepush] unit suite"
  python -m pytest tests/suites/unit/ -q --no-header
fi

echo "[prepush] OK"
