.PHONY: help setup setup-runtime fmt lint type-completeness test test-unit test-parity check prepush prepush-check prepush-hook import-lint workflow-lint ci-contracts train predict bench optin-all-restricted quality-gate-full clean

.DEFAULT_GOAL := help

# Developer workflow entry points. Counterpart of the reference Makefile,
# adapted to this framework's in-house, zero-egress tooling: the boundary
# import-lint, the inspect-based type-completeness ratchet, and the pytest
# suites replace the reference's uv/ruff/mypy/pyright lanes (none of which
# are installable here).

FILE ?= $(if $(wildcard sample.wav),sample.wav,$(error sample.wav not found; run `make predict FILE=path/to.wav`))

help:
	@echo "Targets:"
	@echo "  setup    - editable install (offline: --no-deps --no-build-isolation) + git hooks"
	@echo "  setup-runtime - editable install only (no git hooks)"
	@echo "  fmt      - normalize source (compile-check; no formatter ships in this env)"
	@echo "  lint     - boundary import-lint + byte-compile sweep"
	@echo "  type-completeness - enforce public-API annotation completeness ratchet"
	@echo "  test     - run the full suite (CPU-forced, 8 virtual devices)"
	@echo "  test-unit - run the unit suites only"
	@echo "  test-parity - run the differential parity suites vs /root/reference"
	@echo "  check    - lint + type-completeness + test"
	@echo "  prepush  - run local pre-push quality gates"
	@echo "  prepush-check - canonical pre-push gate, check-only"
	@echo "  prepush-hook - install + exercise the git pre-push hook workflow"
	@echo "  import-lint - public API boundary import-lint lane"
	@echo "  workflow-lint - validate GitHub Actions workflow contracts"
	@echo "  ci-contracts - run CI/CD policy contract tests"
	@echo "  train    - train the active profile"
	@echo "  predict  - run prediction (set FILE=sample.wav)"
	@echo "  bench    - run the real-chip benchmark (one JSON line)"
	@echo "  optin-all-restricted - persist consent for all known restricted backends"
	@echo "  quality-gate-full - run the full-dataset quality gate suite"
	@echo "  clean    - remove caches"

setup:
	./scripts/setup_compatible_env.sh

setup-runtime:
	SER_SETUP_INSTALL_GIT_HOOKS=false ./scripts/setup_compatible_env.sh

fmt:
	python -m compileall -q ser_tpu ser tests scripts

lint:
	bash ./scripts/run_import_lint.sh
	python -m compileall -q ser_tpu ser tests scripts

type-completeness:
	JAX_PLATFORMS=cpu python scripts/check_type_completeness.py

test:
	python -m pytest tests/ -q

test-unit:
	python -m pytest tests/suites/unit/ -q

test-parity:
	python -m pytest tests/suites/parity/ -q

check: lint type-completeness test

prepush-check:
	bash ./scripts/run_prepush_gate.sh

prepush:
	bash ./scripts/run_prepush_gate.sh --full

prepush-hook:
	bash ./scripts/install_git_hooks.sh

import-lint:
	bash ./scripts/run_import_lint.sh

workflow-lint:
	python -m pytest tests/suites/integration/architecture/test_ci_workflow_contracts.py -q

ci-contracts:
	python -m pytest -q \
		tests/suites/integration/architecture/test_ci_workflow_contracts.py \
		tests/suites/integration/architecture/test_ci_change_classifier.py

train:
	python -m ser_tpu --train

predict:
	python -m ser_tpu --file $(FILE)

bench:
	python bench.py

optin-all-restricted:
	python -m ser_tpu --accept-all-restricted-backends

quality-gate-full:
	./scripts/run_full_dataset_quality_gate.sh

clean:
	find . -type d -name "__pycache__" -prune -exec rm -rf {} +
	rm -rf .pytest_cache dist build reports
