"""Architecture contract: the wheel ships PEP 561 typing markers.

Parity surface: reference ``tests/suites/integration/architecture/
test_py_typed_distribution.py`` — downstream type checkers only honor inline
annotations when the installed distribution carries ``py.typed``; a fresh
wheel must include the marker for both the ``ser_tpu`` package and the
``ser`` drop-in alias, plus the profile catalog data file the runtime loads.
"""

from __future__ import annotations

import subprocess
import sys
import zipfile
from pathlib import Path

import pytest

REPO_ROOT = Path(__file__).resolve().parents[4]

_REQUIRED_WHEEL_MEMBERS = (
    "ser_tpu/py.typed",
    "ser/py.typed",
    "ser_tpu/profile_defs.yaml",
)


@pytest.mark.slow
def test_wheel_contains_typing_markers_and_profile_catalog(tmp_path: Path) -> None:
    """A freshly built wheel must carry py.typed markers and the catalog."""
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "pip",
            "wheel",
            ".",
            "--no-deps",
            "--no-build-isolation",
            "-w",
            str(tmp_path),
        ],
        cwd=REPO_ROOT,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    wheels = sorted(tmp_path.glob("ser_tpu-*.whl"))
    assert len(wheels) == 1, f"expected one wheel, found {wheels}"
    with zipfile.ZipFile(wheels[0]) as wheel:
        members = set(wheel.namelist())
    missing = [name for name in _REQUIRED_WHEEL_MEMBERS if name not in members]
    assert missing == [], f"wheel is missing distribution members: {missing}"


def test_source_tree_carries_py_typed_markers() -> None:
    """The in-tree markers exist and are declared as package data."""
    assert (REPO_ROOT / "ser_tpu" / "py.typed").is_file()
    assert (REPO_ROOT / "ser" / "py.typed").is_file()
    pyproject = (REPO_ROOT / "pyproject.toml").read_text(encoding="utf-8")
    assert 'ser_tpu = ["profile_defs.yaml", "py.typed"]' in pyproject
    assert 'ser = ["py.typed"]' in pyproject
