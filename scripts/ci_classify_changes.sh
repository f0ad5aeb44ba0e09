#!/usr/bin/env bash
# Classifies a pull request's change scope so default CI can skip the heavy
# test tiers on documentation-only diffs.
#
# Parity surface: reference scripts/ci_classify_changes.sh — same output
# contract (`run_full` / `docs_only` / `reason` appended to the GitHub output
# file), same event semantics (non-PR events always run full CI; missing
# required environment exits 2), re-targeted at this repository's layout
# (ser_tpu/, ser/, bench.py, __graft_entry__.py are code surfaces).
set -euo pipefail

usage() {
  cat <<'EOF'
Usage: ./scripts/ci_classify_changes.sh <github-output-path>

Environment:
  CI_EVENT_NAME   GitHub event name (for example: pull_request, push).
  CI_BASE_SHA     Base commit SHA for pull_request comparisons.
  CI_HEAD_SHA     Head commit SHA for pull_request comparisons.
EOF
}

emit() {
  local destination="$1" run_full="$2" docs_only="$3" reason="$4"
  {
    printf 'run_full=%s\n' "$run_full"
    printf 'docs_only=%s\n' "$docs_only"
    printf 'reason=%s\n' "$reason"
  } >>"$destination"
}

if [[ $# -ne 1 ]]; then
  usage >&2
  exit 2
fi

readonly output_path="$1"

if [[ -z "${CI_EVENT_NAME:-}" ]]; then
  printf 'CI_EVENT_NAME is required.\n' >&2
  exit 2
fi

if [[ "$CI_EVENT_NAME" != "pull_request" ]]; then
  emit "$output_path" "true" "false" "non_pull_request"
  exit 0
fi

if [[ -z "${CI_BASE_SHA:-}" || -z "${CI_HEAD_SHA:-}" ]]; then
  printf 'CI_BASE_SHA and CI_HEAD_SHA are required for pull_request events.\n' >&2
  exit 2
fi

mapfile -t changed_files < <(git diff --name-only "$CI_BASE_SHA" "$CI_HEAD_SHA" --)

if [[ ${#changed_files[@]} -eq 0 ]]; then
  emit "$output_path" "true" "false" "empty_diff"
  exit 0
fi

docs_only="true"
for path in "${changed_files[@]}"; do
  case "$path" in
    # Code / packaging / CI surfaces: any hit demands full CI.
    ser_tpu/*|ser/*|tests/*|scripts/*|.github/workflows/*|native/*)
      docs_only="false"
      break
      ;;
    pyproject.toml|bench.py|__graft_entry__.py|boundary_policy.toml|README.md|LICENSE)
      docs_only="false"
      break
      ;;
    # Documentation surfaces that never change runtime behavior.
    docs/*|*.md|*.jsonl|BENCH_*.json|MULTICHIP_*.json|EVAL_*.json|BASELINE.json|COPYCHECK.json|DECODE_ABLATION_*.json)
      ;;
    *)
      docs_only="false"
      break
      ;;
  esac
done

if [[ "$docs_only" == "true" ]]; then
  emit "$output_path" "false" "true" "docs_only_pull_request"
  exit 0
fi

emit "$output_path" "true" "false" "full_ci_required"
