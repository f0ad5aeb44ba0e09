"""Per-owner tests for ``_internal/runtime/quality_gate_workflow.py``.

Behavior spec: reference ``quality_gate_cli.py`` exit-code contract — 0 on
promote (or advisory hold), 1 on an enforced hold, 2 on unusable
corpus/config — plus the persisted-report side effect. The evaluation math
is owned by ``test_quality_gate_report.py`` and the parity suite; here the
workflow's control flow is isolated with a stubbed evaluator.
"""

from __future__ import annotations

import json

import pytest

import ser_tpu._internal.runtime.quality_gate_workflow as workflow_mod
from ser_tpu._internal.runtime.quality_gate import (
    ProfileEvaluation,
    QualityGateDecision,
)
from ser_tpu.config import reload_settings


@pytest.fixture()
def settings(tmp_path, monkeypatch):
    monkeypatch.setenv("SER_MODELS_FOLDER", str(tmp_path / "models"))
    monkeypatch.setenv("SER_DATASET_FOLDER", str(tmp_path / "dataset"))
    return reload_settings()


def _decision(promote: bool) -> QualityGateDecision:
    baseline = ProfileEvaluation(profile="fast", uar=0.5, macro_f1=0.5, folds=4)
    candidate = ProfileEvaluation(profile="medium", uar=0.6, macro_f1=0.6, folds=4)
    return QualityGateDecision(
        promote=promote,
        reasons=("stubbed",),
        baseline=baseline,
        candidate=candidate,
        candidate_stability=None,
    )


def test_promote_exits_zero_and_writes_report(settings, monkeypatch, tmp_path, capsys):
    monkeypatch.setattr(
        workflow_mod, "evaluate_candidate_gate", lambda **kwargs: _decision(True)
    )
    report_path = tmp_path / "gate.json"
    code = workflow_mod.run_quality_gate_workflow(
        settings=settings, candidate="medium", output_path=report_path
    )
    assert code == 0
    payload = json.loads(report_path.read_text())
    assert payload["candidate_profile"] == "medium"
    assert "PROMOTE" in capsys.readouterr().out


def test_hold_is_advisory_without_require_pass(settings, monkeypatch, tmp_path):
    monkeypatch.setattr(
        workflow_mod, "evaluate_candidate_gate", lambda **kwargs: _decision(False)
    )
    code = workflow_mod.run_quality_gate_workflow(
        settings=settings, candidate="medium", output_path=tmp_path / "gate.json"
    )
    assert code == 0


def test_hold_fails_under_require_pass(settings, monkeypatch, tmp_path, capsys):
    monkeypatch.setattr(
        workflow_mod, "evaluate_candidate_gate", lambda **kwargs: _decision(False)
    )
    code = workflow_mod.run_quality_gate_workflow(
        settings=settings,
        candidate="medium",
        output_path=tmp_path / "gate.json",
        require_pass=True,
    )
    assert code == 1
    # The report is still written before enforcement fails.
    assert (tmp_path / "gate.json").is_file()


@pytest.mark.parametrize(
    "error", [RuntimeError("too few clips"), ValueError("bad candidate"), KeyError("x")]
)
def test_input_defects_exit_two_without_traceback(settings, monkeypatch, error, capsys):
    def raising(**kwargs):
        raise error

    monkeypatch.setattr(workflow_mod, "evaluate_candidate_gate", raising)
    code = workflow_mod.run_quality_gate_workflow(settings=settings, candidate="medium")
    assert code == 2
    assert capsys.readouterr().err.strip()
