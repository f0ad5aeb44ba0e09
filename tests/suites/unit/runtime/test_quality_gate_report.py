"""Quality-gate report persistence schema + enforcement owners."""

import json

import pytest

from ser_tpu._internal.runtime import quality_gate_report as qgr
from ser_tpu._internal.runtime.quality_gate import (
    ProfileEvaluation,
    QualityGateDecision,
    TemporalStability,
)


def _decision(promote=True):
    return QualityGateDecision(
        promote=promote,
        reasons=("All promotion thresholds met.",) if promote else ("UAR delta low.",),
        baseline=ProfileEvaluation("fast", 0.61, 0.58, 4),
        candidate=ProfileEvaluation("medium", 0.66, 0.64, 4),
        candidate_stability=TemporalStability(6.0, 3.2),
    )


def test_payload_schema_and_roundtrip(tmp_path):
    payload = qgr.build_report_payload(_decision(), corpus="/data/ravdess")
    assert payload["schema_version"] == qgr.GATE_REPORT_SCHEMA_VERSION
    assert payload["candidate_profile"] == "medium"
    assert payload["baseline"]["uar"] == 0.61
    target = tmp_path / "reports" / "gate.json"
    written = qgr.write_gate_report(payload, target)
    assert written == target
    loaded = qgr.load_gate_report(target)
    assert loaded is not None
    assert loaded["promote"] is True
    assert loaded["candidate_stability"]["segments_per_minute"] == 6.0


def test_serialization_is_deterministic():
    payload = qgr.build_report_payload(_decision())
    payload["generated_at_unix"] = 0.0
    first = qgr.serialize_report_payload(payload)
    second = qgr.serialize_report_payload(dict(reversed(list(payload.items()))))
    assert first == second  # sorted keys → key order cannot leak


def test_write_is_atomic_no_staging_left(tmp_path):
    target = tmp_path / "gate.json"
    qgr.write_gate_report(qgr.build_report_payload(_decision()), target)
    leftovers = [p for p in tmp_path.iterdir() if p.name.startswith(".gate-report-")]
    assert leftovers == []


def test_load_rejects_unknown_schema(tmp_path):
    target = tmp_path / "gate.json"
    target.write_text(json.dumps({"schema_version": 999}), encoding="utf-8")
    assert qgr.load_gate_report(target) is None
    assert qgr.load_gate_report(tmp_path / "missing.json") is None


def test_default_output_path_resolution(tmp_path):
    resolved = qgr.resolve_report_output_path(output_path=None, default_directory=tmp_path)
    assert resolved == tmp_path / qgr.DEFAULT_REPORT_FILE_NAME
    explicit = qgr.resolve_report_output_path(
        output_path=tmp_path / "x.json", default_directory=tmp_path
    )
    assert explicit == tmp_path / "x.json"


def test_enforcement_raises_only_when_required_and_held():
    qgr.enforce_quality_gate(_decision(promote=True), require_pass=True)
    qgr.enforce_quality_gate(_decision(promote=False), require_pass=False)
    with pytest.raises(qgr.QualityGateFailedError, match="UAR delta"):
        qgr.enforce_quality_gate(_decision(promote=False), require_pass=True)


def test_gate_workflow_exit_codes(tmp_path, monkeypatch):
    """Advisory hold exits 0; --require-pass makes a hold exit 1; input
    defects exit 2 (not tracebacks)."""
    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.runtime import quality_gate_workflow as wf

    settings = build_settings_from_inputs(
        capture_settings_inputs(env={"SER_MODELS_FOLDER": str(tmp_path)})
    )

    monkeypatch.setattr(
        wf, "evaluate_candidate_gate", lambda **_kw: _decision(promote=False)
    )
    assert (
        wf.run_quality_gate_workflow(
            settings=settings, candidate="medium", output_path=tmp_path / "g1.json"
        )
        == 0
    )  # advisory hold
    assert (
        wf.run_quality_gate_workflow(
            settings=settings,
            candidate="medium",
            output_path=tmp_path / "g2.json",
            require_pass=True,
        )
        == 1
    )  # enforced hold

    monkeypatch.setattr(
        wf, "evaluate_candidate_gate", lambda **_kw: _decision(promote=True)
    )
    assert (
        wf.run_quality_gate_workflow(
            settings=settings, candidate="medium", output_path=tmp_path / "g3.json"
        )
        == 0
    )

    def boom(**_kw):
        raise KeyError("no such profile")

    monkeypatch.setattr(wf, "evaluate_candidate_gate", boom)
    assert (
        wf.run_quality_gate_workflow(
            settings=settings, candidate="mystery", output_path=tmp_path / "g4.json"
        )
        == 2
    )
