"""Import-boundary contract (reference test_api_import_boundary.py pattern)."""

import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[4]


def test_public_modules_respect_boundary_policy():
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_public_internal_imports.py")],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert result.returncode == 0, result.stdout + result.stderr


def test_package_ships_py_typed():
    assert (REPO / "ser_tpu" / "py.typed").exists()


def test_domain_module_is_dependency_free():
    """ser_tpu.domain must import nothing beyond typing (it's the leaf contract)."""
    import ast

    tree = ast.parse((REPO / "ser_tpu" / "domain.py").read_text(encoding="utf-8"))
    imports = [
        node for node in ast.walk(tree) if isinstance(node, (ast.Import, ast.ImportFrom))
    ]
    modules = {
        alias.name if isinstance(node, ast.Import) else node.module
        for node in imports
        for alias in getattr(node, "names", [])
    }
    assert modules <= {"typing"}
