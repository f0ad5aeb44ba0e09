#!/usr/bin/env bash
# Prepare a hardware-validation environment: install, consents, synthetic
# corpus, runtime dirs.
# Counterpart of the reference's scripts/workflows/setup_validation_environment.sh
# (uv sync + extras selection); here dependencies are baked into the image,
# so validation setup means: editable install, validation-dataset consents,
# a synthetic RAVDESS corpus to run against, and the runtime directories.
set -euo pipefail
cd "$(dirname "$0")/../.."

run_accurate_research="false"
while [[ $# -gt 0 ]]; do
  case "$1" in
    --accurate-research) run_accurate_research="true"; shift ;;
    -h|--help)
      cat <<'EOF'
Usage: ./scripts/workflows/setup_validation_environment.sh [options]

Options:
  --accurate-research   Also record restricted-backend consent so the
                        accurate-research lane can run.
  -h, --help            Show this help text.

Environment:
  SER_VALIDATION_DATASET_DIR   Where to build the synthetic corpus
                               (default: ./validation_dataset).
EOF
      exit 0 ;;
    *) printf 'Unknown option: %s\n' "$1" >&2; exit 2 ;;
  esac
done

dataset_dir="${SER_VALIDATION_DATASET_DIR:-validation_dataset}"

./scripts/setup_compatible_env.sh --skip-git-hooks
if [[ -n "${GITHUB_ENV:-}" ]]; then
  # Workflow runners scope the runtime dirs through GITHUB_ENV; local runs
  # use the platform defaults the config schema resolves.
  bash ./scripts/workflows/configure_runtime_dirs.sh
fi
bash ./scripts/configure_validation_dataset_consents.sh

echo "[validation-setup] building synthetic RAVDESS corpus at $dataset_dir"
python scripts/build_synthetic_ravdess_dataset.py "$dataset_dir"

if [[ "$run_accurate_research" == "true" ]]; then
  echo "[validation-setup] recording restricted-backend consents"
  python -m ser_tpu --accept-all-restricted-backends
fi

echo "[validation-setup] OK (export SER_DATASET_FOLDER=$dataset_dir to use it)"
