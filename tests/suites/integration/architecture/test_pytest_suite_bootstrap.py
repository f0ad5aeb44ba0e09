"""Architecture contract: pytest bootstrap responsibilities + marker ownership.

Parity surface: reference ``tests/suites/integration/architecture/
test_pytest_suite_bootstrap.py`` — the suite's conftest owns specific
bootstrap responsibilities, and every custom marker used by a test module
must be registered in ``pyproject.toml``. TPU-specific responsibilities: the
conftest MUST pin ``jax_platforms`` to cpu after importing jax (the axon TPU
plugin pins ``axon,cpu`` via sitecustomize, so the env var alone is not
enough) and force the 8-device virtual host platform the sharding tests
depend on.
"""

from __future__ import annotations

import ast
import re
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[4]

#: Markers pytest itself (or its plugins) own — not required in pyproject.
_BUILTIN_MARKERS = frozenset(
    {
        "parametrize",
        "skip",
        "skipif",
        "xfail",
        "usefixtures",
        "filterwarnings",
    }
)


def _registered_markers() -> set[str]:
    pyproject = (REPO_ROOT / "pyproject.toml").read_text(encoding="utf-8")
    section = pyproject.split("markers = [", 1)[1].split("]", 1)[0]
    return {match.group(1) for match in re.finditer(r'"(\w+):', section)}


def _marker_names(node: ast.expr) -> set[str]:
    if isinstance(node, ast.Call):
        return _marker_names(node.func)
    if (
        isinstance(node, ast.Attribute)
        and isinstance(node.value, ast.Attribute)
        and isinstance(node.value.value, ast.Name)
        and node.value.value.id == "pytest"
        and node.value.attr == "mark"
    ):
        return {node.attr}
    if isinstance(node, (ast.List, ast.Tuple)):
        names: set[str] = set()
        for element in node.elts:
            names.update(_marker_names(element))
        return names
    return set()


def _used_markers() -> dict[str, set[str]]:
    """Maps marker name -> test files using it, via AST over ``pytest.mark.*``."""
    used: dict[str, set[str]] = {}
    for path in sorted((REPO_ROOT / "tests").rglob("*.py")):
        tree = ast.parse(path.read_text(encoding="utf-8"))
        for node in ast.walk(tree):
            if isinstance(node, ast.Attribute):
                for name in _marker_names(node):
                    used.setdefault(name, set()).add(
                        path.relative_to(REPO_ROOT).as_posix()
                    )
    return used


def test_every_custom_marker_is_registered() -> None:
    """Markers applied by test modules must be declared in pyproject.toml."""
    registered = _registered_markers()
    unknown = {
        name: sorted(files)[:3]
        for name, files in _used_markers().items()
        if name not in registered and name not in _BUILTIN_MARKERS
    }
    assert not unknown, f"Unregistered pytest markers in use: {unknown}"


def test_conftest_owns_cpu_platform_and_virtual_mesh_bootstrap() -> None:
    """The root conftest keeps its load-bearing TPU-plugin containment."""
    conftest = (REPO_ROOT / "tests" / "conftest.py").read_text(encoding="utf-8")
    # Env-var pin alone is insufficient under the axon sitecustomize plugin;
    # both the env pin and the post-import config update must stay.
    assert 'os.environ["JAX_PLATFORMS"] = "cpu"' in conftest
    assert 'jax.config.update("jax_platforms", "cpu")' in conftest
    assert "xla_force_host_platform_device_count=8" in conftest
    # Dataset-registry isolation keeps test runs from polluting XDG state.
    assert "SER_DATASET_REGISTRY_ROOT" in conftest


def test_suite_directories_derive_markers() -> None:
    """Suite tier directories exist for the directory-derived marker scheme."""
    for tier in ("unit", "integration", "smoke", "parity"):
        assert (REPO_ROOT / "tests" / "suites" / tier).is_dir(), tier
