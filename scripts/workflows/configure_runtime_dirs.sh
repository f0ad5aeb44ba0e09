#!/usr/bin/env bash
# Exports the runtime directory layout into a GitHub workflow's environment.
#
# Parity surface: reference scripts/workflows/configure_runtime_dirs.sh —
# same option names, same exported SER_* variables, same exit-2 contract when
# GITHUB_ENV is absent. Directories are created before export so the first
# workflow step that reads them never races their creation.
set -euo pipefail

print_usage() {
  cat <<'USAGE'
Usage: ./scripts/workflows/configure_runtime_dirs.sh [options]

Options:
  --max-workers <count>      Value exported as SER_MAX_WORKERS (default: 1).
  --models-dir <path>        Directory exported as SER_MODELS_DIR.
  --data-dir <path>          Directory exported as SER_DATA_DIR.
  --cache-dir <path>         Directory exported as SER_CACHE_DIR.
  --transcripts-dir <path>   Directory exported as SER_TRANSCRIPTS_DIR.
  -h, --help                 Show this help text.
USAGE
}

if [[ -z "${GITHUB_ENV:-}" ]]; then
  printf 'GITHUB_ENV must be set when configuring workflow runtime directories.\n' >&2
  exit 2
fi

scratch_root="${RUNNER_TEMP:-${TMPDIR:-/tmp}}"
worker_count="1"
dir_models="$scratch_root/ser-models"
dir_data="$scratch_root/ser-data"
dir_cache="$scratch_root/ser-cache"
dir_transcripts="$scratch_root/ser-transcripts"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --max-workers) worker_count="$2"; shift 2 ;;
    --models-dir) dir_models="$2"; shift 2 ;;
    --data-dir) dir_data="$2"; shift 2 ;;
    --cache-dir) dir_cache="$2"; shift 2 ;;
    --transcripts-dir) dir_transcripts="$2"; shift 2 ;;
    -h|--help) print_usage; exit 0 ;;
    *)
      printf 'Unknown option: %s\n' "$1" >&2
      print_usage >&2
      exit 2
      ;;
  esac
done

mkdir -p "$dir_models" "$dir_data" "$dir_cache" "$dir_transcripts"

{
  printf 'SER_MAX_WORKERS=%s\n' "$worker_count"
  printf 'SER_MODELS_DIR=%s\n' "$dir_models"
  printf 'SER_DATA_DIR=%s\n' "$dir_data"
  printf 'SER_CACHE_DIR=%s\n' "$dir_cache"
  printf 'SER_TRANSCRIPTS_DIR=%s\n' "$dir_transcripts"
} >> "$GITHUB_ENV"
