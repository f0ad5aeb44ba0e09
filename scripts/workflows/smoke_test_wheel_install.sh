#!/usr/bin/env bash
# Installs the built wheel into a throwaway venv and import-smokes it.
#
# Parity surface: reference scripts/workflows/smoke_test_wheel_install.sh —
# same wheel-glob argument, exit 2 when nothing matches, fresh `.pkg-smoke`
# venv, forced reinstall without dependencies, and an import probe run from a
# temp directory (so the repo checkout can never shadow the installed
# package). Differences for this zero-egress environment: no `pip install
# --upgrade pip` (network), the venv shares system site-packages (jax/numpy
# are baked into the image, the wheel is installed with --no-deps anyway),
# and installs pass --no-index so any dependency resolution attempt fails
# loudly instead of reaching for the network. The probe also checks the `ser`
# drop-in alias package that ships inside the wheel.
set -euo pipefail

wheel_pattern="${1:-dist/*.whl}"
shopt -s nullglob
matched_wheels=($wheel_pattern)
shopt -u nullglob

if [[ ${#matched_wheels[@]} -eq 0 ]]; then
  printf 'No wheels matched %s\n' "$wheel_pattern" >&2
  exit 2
fi

venv_dir="${SER_PKG_SMOKE_DIR:-.pkg-smoke}"
rm -rf "$venv_dir"
# The invoking interpreter may itself be a venv (this image keeps every baked
# dependency in one); a child venv chains to the BASE prefix and would lose
# them all, so the parent's site-packages is linked in via a .pth entry —
# appended after the venv's own site dir, so the installed wheel can never be
# shadowed by a stray repo/parent copy.
parent_site="$(python -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
python -m venv --system-site-packages "$venv_dir"
# shellcheck disable=SC1091
. "$venv_dir/bin/activate"
# -S: skip site processing — this image's sitecustomize imports numpy, which
# is not visible inside the venv until the .pth below exists.
venv_site="$(python -S -c 'import sysconfig; print(sysconfig.get_paths()["purelib"])')"
printf '%s\n' "$parent_site" > "$venv_site/zz-parent-site.pth"
pip install --no-index --no-deps --force-reinstall "${matched_wheels[@]}"

probe_dir="$(mktemp -d)"
cd "$probe_dir"

python - <<'PY'
import importlib.metadata as metadata

import ser
import ser_tpu
from ser_tpu import api

print(f"Installed ser-tpu version: {metadata.version('ser-tpu')}")
print(f"Imported ser_tpu from: {ser_tpu.__file__}")
print(f"Alias ser resolves to: {ser.__file__}")
print(f"Exports: {', '.join(api.__all__)}")
PY
