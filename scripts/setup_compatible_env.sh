#!/usr/bin/env bash
# Platform-aware environment setup for this repository.
# Counterpart of the reference's scripts/setup_compatible_env.sh (uv-based
# dependency sync + git hooks + ffmpeg check), adapted to the TPU build's
# constraints: dependencies are baked into the image (zero egress — a plain
# `pip install` would try the network and fail), audio IO is in-house WAV
# (no ffmpeg requirement), and the native decoder fast path g++-compiles at
# first use.
set -euo pipefail
cd "$(dirname "$0")/.."

install_git_hooks="$(printf '%s' "${SER_SETUP_INSTALL_GIT_HOOKS:-true}" | tr '[:upper:]' '[:lower:]')"
check_native="$(printf '%s' "${SER_SETUP_CHECK_NATIVE:-true}" | tr '[:upper:]' '[:lower:]')"
dry_run="$(printf '%s' "${SER_SETUP_DRY_RUN:-false}" | tr '[:upper:]' '[:lower:]')"

while [[ $# -gt 0 ]]; do
  case "$1" in
    --skip-git-hooks) install_git_hooks="false"; shift ;;
    --skip-native-check) check_native="false"; shift ;;
    --dry-run) dry_run="true"; shift ;;
    -h|--help)
      cat <<'EOF'
Usage: ./scripts/setup_compatible_env.sh [options]

Options:
  --skip-git-hooks     Do not install git hooks even when `.git/` exists.
  --skip-native-check  Do not probe the native C++ audio fast path.
  --dry-run            Print planned commands without executing them.
  -h, --help           Show this help text.

Environment overrides:
  SER_SETUP_INSTALL_GIT_HOOKS true/false (default: true)
  SER_SETUP_CHECK_NATIVE      true/false (default: true)
  SER_SETUP_DRY_RUN           true/false (default: false)
EOF
      exit 0 ;;
    *) printf 'Unknown option: %s\n' "$1" >&2; exit 2 ;;
  esac
done

run() {
  if [[ "$dry_run" == "true" ]]; then
    printf '[dry-run] %s\n' "$*"
  else
    "$@"
  fi
}

echo "[setup] editable install (offline mode)"
run python -m pip install -e . --no-deps --no-build-isolation --quiet

echo "[setup] verifying baked-in runtime dependencies"
run python - <<'EOF'
import importlib
missing = [m for m in ("jax", "flax", "optax", "numpy", "yaml") if importlib.util.find_spec(m) is None]
if missing:
    raise SystemExit(f"Missing baked-in dependencies: {missing} — this image is not compatible.")
print("  jax/flax/optax/numpy/yaml present")
EOF

if [[ "$install_git_hooks" == "true" && -d .git ]]; then
  echo "[setup] installing git hooks"
  run bash ./scripts/install_git_hooks.sh
fi

if [[ "$check_native" == "true" ]]; then
  echo "[setup] probing native audio fast path (g++ compile on first use)"
  run python - <<'EOF'
from ser_tpu._internal.utils import native_audio
ok = native_audio.native_decoder_available()
print(f"  native decoder available: {ok}")
EOF
fi

echo "[setup] OK"
