#!/usr/bin/env bash
# Install the repo's git hooks (pre-push -> run_prepush_gate.sh).
# Counterpart of the reference's scripts/install_git_hooks.sh.
set -euo pipefail
cd "$(dirname "$0")/.."
HOOKS_DIR="$(git rev-parse --git-path hooks)"
mkdir -p "$HOOKS_DIR"
cat > "$HOOKS_DIR/pre-push" <<'EOF'
#!/usr/bin/env bash
exec "$(git rev-parse --show-toplevel)/scripts/run_prepush_gate.sh"
EOF
chmod +x "$HOOKS_DIR/pre-push"
echo "Installed pre-push hook -> scripts/run_prepush_gate.sh"
