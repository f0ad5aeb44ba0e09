#!/usr/bin/env python
"""AST import lint enforcing boundary_policy.toml.

Parity surface: reference ``scripts/check_public_internal_imports.py`` — walks
every public module, collects its ``ser_tpu._internal`` imports, and fails when
one is not covered by the policy allowlist.
"""

from __future__ import annotations

import ast
import sys
import tomllib
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
PACKAGE = REPO / "ser_tpu"
POLICY = REPO / "boundary_policy.toml"


def module_name_of(path: Path) -> str:
    relative = path.relative_to(REPO).with_suffix("")
    parts = list(relative.parts)
    if parts[-1] == "__init__":
        parts = parts[:-1]
    return ".".join(parts)


def internal_imports_of(path: Path) -> set[str]:
    tree = ast.parse(path.read_text(encoding="utf-8"))
    found: set[str] = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("ser_tpu._internal"):
                    found.add(alias.name)
        elif isinstance(node, ast.ImportFrom) and node.module:
            if node.module.startswith("ser_tpu._internal"):
                found.add(node.module)
    return found


def main() -> int:
    policy = tomllib.loads(POLICY.read_text(encoding="utf-8"))["allowed"]
    violations: list[str] = []
    for path in sorted(PACKAGE.rglob("*.py")):
        if "_internal" in path.parts:
            continue
        module = module_name_of(path)
        allowed_prefixes: list[str] = []
        for policy_module, prefixes in policy.items():
            if module == policy_module or module.startswith(policy_module + "."):
                allowed_prefixes.extend(prefixes)
        for imported in sorted(internal_imports_of(path)):
            if not any(
                imported == prefix or imported.startswith(prefix + ".")
                for prefix in allowed_prefixes
            ):
                violations.append(f"{module}: imports {imported} (not in policy)")
    if violations:
        print("Import-boundary violations:")
        for violation in violations:
            print(f"  {violation}")
        return 1
    print("Import boundary clean.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
