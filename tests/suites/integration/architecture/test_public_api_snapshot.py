"""Public API surface contract (reference architecture-test strategy, SURVEY §4).

The snapshot pins the exported symbol list; accidental additions or removals
fail CI until the snapshot is deliberately regenerated.
"""

import inspect
import json
from pathlib import Path

SNAPSHOT = Path(__file__).parent / "public_api_snapshot.json"


def test_api_all_matches_snapshot():
    from ser_tpu import api

    expected = json.loads(SNAPSHOT.read_text(encoding="utf-8"))
    assert sorted(api.__all__) == expected, (
        "Public API surface changed. If intentional, regenerate "
        "public_api_snapshot.json."
    )


def test_all_exports_resolve():
    from ser_tpu import api

    for symbol in api.__all__:
        assert hasattr(api, symbol), f"api.__all__ exports missing attribute {symbol!r}"


def test_workflow_signatures_are_keyword_only():
    """Reference api.py keeps every workflow kwarg-only (except infer's path)."""
    from ser_tpu import api

    for name in ("train", "prepare_dataset", "run_startup_preflight"):
        sig = inspect.signature(getattr(api, name))
        kinds = {p.kind for p in sig.parameters.values()}
        assert kinds <= {inspect.Parameter.KEYWORD_ONLY}, name
    infer_params = list(inspect.signature(api.infer).parameters.values())
    assert infer_params[0].name == "file_path"
    assert all(p.kind == inspect.Parameter.KEYWORD_ONLY for p in infer_params[1:])


def test_infer_signature_matches_reference():
    from ser_tpu import api

    params = list(inspect.signature(api.infer).parameters)
    assert params == [
        "file_path",
        "profile",
        "language",
        "save_transcript",
        "include_transcript",
        "subtitle_output_path",
        "subtitle_format",
        "settings",
        "pipeline_builder",
    ]
