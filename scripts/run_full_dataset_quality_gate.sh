#!/usr/bin/env bash
# Full-dataset quality gate suite: optionally train the fast + candidate
# profiles over the configured corpus, then run the promote/hold gate and
# archive the versioned report.
# Counterpart of the reference's scripts/run_full_dataset_quality_gate.sh
# (same SER_FULL_GATE_* knob surface); delegates to the same workflow owner
# as `ser gate` (_internal/runtime/quality_gate_workflow.py).
set -euo pipefail
cd "$(dirname "$0")/.."

lower() { printf '%s' "$1" | tr '[:upper:]' '[:lower:]'; }

run_training="$(lower "${SER_FULL_GATE_RUN_TRAINING:-false}")"
require_pass="$(lower "${SER_FULL_GATE_REQUIRE_PASS:-true}")"
archive_report="$(lower "${SER_FULL_GATE_ARCHIVE_REPORT:-true}")"
candidate="${SER_FULL_GATE_CANDIDATE:-medium}"
folds="${SER_FULL_GATE_FOLDS:-4}"
report_path="${SER_FULL_GATE_REPORT_PATH:-profile_quality_gate_report_full.json}"

for knob in run_training require_pass archive_report; do
  value="${!knob}"
  if [[ "$value" != "true" && "$value" != "false" ]]; then
    printf 'SER_FULL_GATE_%s must be true or false, got: %s\n' \
      "$(printf '%s' "$knob" | tr '[:lower:]' '[:upper:]')" "$value" >&2
    exit 2
  fi
done

if [[ "$run_training" == "true" ]]; then
  echo "[gate-full] training fast profile"
  python -m ser_tpu --train --profile fast
  echo "[gate-full] training candidate profile: $candidate"
  python -m ser_tpu --train --profile "$candidate"
fi

gate_args=(gate --candidate "$candidate" --folds "$folds" --output "$report_path")
if [[ "$require_pass" == "true" ]]; then
  gate_args+=(--require-pass)
fi

echo "[gate-full] running quality gate: $candidate vs fast"
python -m ser_tpu "${gate_args[@]}"
gate_exit=$?

if [[ "$archive_report" == "true" && -f "$report_path" ]]; then
  mkdir -p reports
  archive="reports/profile_quality_gate_report_$(date -u +%Y%m%dT%H%M%SZ).json"
  cp "$report_path" "$archive"
  echo "[gate-full] report archived: $archive"
fi

exit "$gate_exit"
