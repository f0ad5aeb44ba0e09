#!/usr/bin/env bash
# Public-API boundary import-lint lane.
# Counterpart of the reference's scripts/run_import_lint.sh: the reference
# runs ruff TID251 + an AST checker + the boundary contract tests; here the
# AST checker (scripts/check_public_internal_imports.py, policy in
# boundary_policy.toml) IS the lint, and the same contract tests pin it.
set -euo pipefail
cd "$(dirname "$0")/.."

python scripts/check_public_internal_imports.py
python -m pytest -q --no-header \
  tests/suites/integration/architecture/test_import_boundary.py
