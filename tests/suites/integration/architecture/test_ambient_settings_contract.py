"""Architecture contract: ambient settings lookups stay at spawn boundaries.

Parity surface: reference ``tests/suites/integration/architecture/
test_ambient_settings_contract.py`` — source modules must receive their
``AppConfig`` explicitly (dependency injection) rather than reaching for the
ambient ``get_settings()`` accessor. The only tolerated call sites are the
process-spawn re-entry points, where no caller exists to inject the settings
object: a fresh worker process must bootstrap its own configuration before
any injected value can reach it.
"""

from __future__ import annotations

import ast
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[4]

#: Call sites allowed to resolve settings ambiently. Each is a spawn-side
#: setup hook that runs in a brand-new worker process (no injecting caller).
ALLOWED_GET_SETTINGS_CALL_SITES: frozenset[tuple[str, str]] = frozenset(
    {
        ("ser_tpu/_internal/runtime/profile_boundary.py", "_spawned_setup"),
        ("ser_tpu/_internal/transcript/extractor.py", "_isolated_setup"),
    }
)


class _AmbientCallCollector(ast.NodeVisitor):
    """Collects direct ``get_settings()`` calls with their enclosing qualname."""

    def __init__(self, relative_path: str) -> None:
        self.relative_path = relative_path
        self.call_sites: set[tuple[str, str]] = set()
        self._scope: list[str] = []

    def _scoped_visit(self, node: ast.AST, name: str) -> None:
        self._scope.append(name)
        self.generic_visit(node)
        self._scope.pop()

    def visit_FunctionDef(self, node: ast.FunctionDef) -> None:
        self._scoped_visit(node, node.name)

    def visit_AsyncFunctionDef(self, node: ast.AsyncFunctionDef) -> None:
        self._scoped_visit(node, node.name)

    def visit_ClassDef(self, node: ast.ClassDef) -> None:
        self._scoped_visit(node, node.name)

    def visit_Call(self, node: ast.Call) -> None:
        if isinstance(node.func, ast.Name) and node.func.id == "get_settings":
            qualname = self._scope[-1] if self._scope else "<module>"
            self.call_sites.add((self.relative_path, qualname))
        self.generic_visit(node)


def _collect_ambient_call_sites() -> set[tuple[str, str]]:
    call_sites: set[tuple[str, str]] = set()
    for package in ("ser_tpu", "ser"):
        for path in sorted((REPO_ROOT / package).rglob("*.py")):
            relative = path.relative_to(REPO_ROOT).as_posix()
            collector = _AmbientCallCollector(relative)
            collector.visit(ast.parse(path.read_text(encoding="utf-8")))
            call_sites.update(collector.call_sites)
    return call_sites


def test_ambient_settings_lookups_restricted_to_spawn_boundaries() -> None:
    """Every direct ``get_settings()`` call must be an allowed spawn boundary."""
    actual = _collect_ambient_call_sites()
    unexpected = actual - ALLOWED_GET_SETTINGS_CALL_SITES
    removed = ALLOWED_GET_SETTINGS_CALL_SITES - actual
    assert not unexpected, (
        "New ambient get_settings() call sites — inject AppConfig instead, or "
        f"(spawn boundaries only) extend the allowlist: {sorted(unexpected)}"
    )
    assert not removed, (
        "Allowlisted spawn-boundary call sites vanished — prune the allowlist: "
        f"{sorted(removed)}"
    )
