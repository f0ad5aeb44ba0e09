"""Differential parity suite: repo stages vs the reference implementation.

Every test here executes the SAME inputs through this repo's stage and through
the real reference code (in an isolated subprocess, see
``tests/utils/helpers/reference_oracle_worker.py``) and asserts bitwise-equal
outputs. The whole suite skips when ``/root/reference`` is absent (CI
machines without the reference checkout).
"""

from __future__ import annotations

import sys
from pathlib import Path

import pytest

_HELPERS = Path(__file__).resolve().parents[3] / "tests" / "utils" / "helpers"
if str(_HELPERS) not in sys.path:
    sys.path.insert(0, str(_HELPERS))

from reference_oracle import ReferenceOracle, reference_available  # noqa: E402

collect_ignore_glob: list[str] = []

if not reference_available():
    collect_ignore_glob.append("*")


@pytest.fixture(scope="session")
def oracle():
    """One persistent reference-oracle worker for the whole session."""
    if not reference_available():
        pytest.skip("reference checkout not available")
    client = ReferenceOracle()
    yield client
    client.close()
