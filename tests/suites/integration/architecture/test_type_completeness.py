"""Public-surface type-completeness ratchet contract.

Parity surface: reference ``scripts/check_type_completeness.py:1-129`` +
its CI contract gate — a configured completeness threshold over the public
surface that can only be ratcheted up. This environment has no pyright, so
the in-house checker inspects the imported public surface directly.
"""

import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[4]


def test_public_surface_meets_type_completeness_threshold():
    result = subprocess.run(
        [sys.executable, str(REPO / "scripts" / "check_type_completeness.py"), "--json"],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert result.returncode == 0, result.stdout + result.stderr
    report = json.loads(result.stdout)
    assert report["ratio"] >= report["threshold"]
    assert report["missing"] == []
    # The surface is non-trivial — a broken import must not pass vacuously.
    assert report["checked"] > 400


def test_threshold_is_a_ratchet():
    import tomllib

    pyproject = tomllib.loads((REPO / "pyproject.toml").read_text("utf-8"))
    threshold = pyproject["tool"]["ser-tpu"]["type_completeness"]["threshold"]
    # 0.99 is the shipped floor; only move it UP.
    assert threshold >= 0.99
