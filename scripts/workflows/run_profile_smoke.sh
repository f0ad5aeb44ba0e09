#!/usr/bin/env bash
# Trains and then runs inference for one runtime profile — the CI profile
# smoke lane.
#
# Parity surface: reference scripts/workflows/run_profile_smoke.sh (train →
# predict via `ser --train --profile` / `ser --file`). The reference wraps
# both calls in `uv run --frozen`; this environment has no uv and installs
# from a frozen image, so the interpreter is taken from --python (default:
# the `python` on PATH) and invoked directly with `-m ser_tpu`.
set -euo pipefail

print_usage() {
  cat <<'USAGE'
Usage: ./scripts/workflows/run_profile_smoke.sh --profile <name> [options]

Options:
  --profile <name>          Profile passed to `ser --train` and `ser --file`.
  --python <executable>     Interpreter to use (default: python on PATH).
  --sample-file <path>      Sample file used for prediction (default: sample.wav).
  --extra-arg <arg>         Extra CLI argument appended to both calls; repeatable.
  -h, --help                Show this help text.
USAGE
}

profile_name=""
python_bin="python"
sample_path="sample.wav"
extra_args=()

while [[ $# -gt 0 ]]; do
  case "$1" in
    --profile) profile_name="$2"; shift 2 ;;
    --python) python_bin="$2"; shift 2 ;;
    --sample-file) sample_path="$2"; shift 2 ;;
    --extra-arg) extra_args+=("$2"); shift 2 ;;
    -h|--help) print_usage; exit 0 ;;
    *)
      printf 'Unknown option: %s\n' "$1" >&2
      print_usage >&2
      exit 2
      ;;
  esac
done

if [[ -z "$profile_name" ]]; then
  printf 'Missing required --profile option.\n' >&2
  print_usage >&2
  exit 2
fi

run_ser() {
  if [[ ${#extra_args[@]} -gt 0 ]]; then
    "$python_bin" -m ser_tpu "$@" "${extra_args[@]}"
  else
    "$python_bin" -m ser_tpu "$@"
  fi
}

run_ser --train --profile "$profile_name"
run_ser --file "$sample_path" --profile "$profile_name"
