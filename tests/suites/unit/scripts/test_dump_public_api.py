"""The signature-level public-API snapshot stays in sync with the code.

Parity surface: reference ``scripts/dump_public_api.py`` +
``tests/suites/integration/architecture/test_public_api_snapshot.py`` — the
reference pins the tier-1 surface (exports, signatures, defaults) as reviewed
JSON and fails CI on unregenerated drift. The flat name snapshot keeps its own
test (``test_public_api_snapshot.py``); this one covers the richer
signature snapshot and the generator's --check contract.
"""

from __future__ import annotations

import importlib.util
import json
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parents[4]
SCRIPT = REPO_ROOT / "scripts" / "dump_public_api.py"
SIGNATURES = (
    REPO_ROOT
    / "tests"
    / "suites"
    / "integration"
    / "architecture"
    / "public_api_signatures.json"
)

spec = importlib.util.spec_from_file_location("dump_public_api", SCRIPT)
dump_public_api = importlib.util.module_from_spec(spec)
sys.modules.setdefault("dump_public_api", dump_public_api)
spec.loader.exec_module(dump_public_api)


def test_signature_snapshot_matches_live_surface():
    committed = json.loads(SIGNATURES.read_text(encoding="utf-8"))
    live = dump_public_api.build_signature_snapshot()
    assert committed == live, (
        "Tier-1 API signatures changed. If intentional, regenerate with "
        "`python scripts/dump_public_api.py`."
    )


def test_snapshot_covers_every_tier_one_module():
    committed = json.loads(SIGNATURES.read_text(encoding="utf-8"))
    assert sorted(committed["modules"]) == sorted(dump_public_api.TIER_ONE_MODULES)
    assert committed["schema_version"] == dump_public_api.SCHEMA_VERSION
    # The facade's 53-symbol surface is the parity contract; every export
    # carries a concrete kind so drift in *shape*, not just names, is pinned.
    api_surface = committed["modules"]["ser_tpu.api"]
    assert len(api_surface) == 53
    assert {entry["kind"] for entry in api_surface.values()} <= {
        "function",
        "class",
        "constant",
        "module",
    }


def test_check_mode_passes_on_current_tree():
    assert dump_public_api.main(["--check"]) == 0


def test_name_snapshot_is_the_sorted_api_all():
    from ser_tpu import api

    assert dump_public_api.build_name_snapshot() == sorted(api.__all__)
