"""Per-owner tests for ``_internal/models/training_orchestration.py``.

Behavior spec: reference ``ser/_internal/models/training_orchestration.py``
— ContextVar-scoped run state (``:85-173``), readiness enforcement at the
entrypoint with backend smoke (``:458-476,529-580``).
"""

from __future__ import annotations

import threading

import pytest

from ser_tpu._internal.models import training_orchestration as orchestration
from ser_tpu._internal.models.training_orchestration import (
    TrainingNotReadyError,
    current_training_run,
    ensure_entrypoint_readiness,
    training_operation_scope,
)
from ser_tpu._internal.models.training_readiness import ReadinessReport


class TestScope:
    def test_no_active_run_outside_scope(self):
        assert current_training_run() is None

    def test_scope_exposes_state_and_resets(self):
        with training_operation_scope("medium") as state:
            assert current_training_run() is state
            assert state.profile == "medium"
            assert state.phase == "pending"
            assert len(state.operation_id) == 12
        assert current_training_run() is None

    def test_scope_resets_on_exception(self):
        with pytest.raises(RuntimeError, match="boom"):
            with training_operation_scope("fast"):
                raise RuntimeError("boom")
        assert current_training_run() is None

    def test_nested_scope_restores_outer(self):
        with training_operation_scope("fast") as outer:
            with training_operation_scope("medium") as inner:
                assert current_training_run() is inner
            assert current_training_run() is outer

    def test_scope_is_contextvar_isolated_across_threads(self):
        # A worker thread must not see the main thread's run state — the
        # reference uses ContextVar (not a global) precisely for this.
        seen: list[object] = []

        def probe():
            seen.append(current_training_run())

        with training_operation_scope("fast"):
            worker = threading.Thread(target=probe)
            worker.start()
            worker.join()
        assert seen == [None]

    def test_operation_ids_are_unique(self):
        with training_operation_scope("fast") as first:
            pass
        with training_operation_scope("fast") as second:
            pass
        assert first.operation_id != second.operation_id


def _report(*, blocking: bool) -> ReadinessReport:
    from ser_tpu._internal.models.training_readiness import (
        FindingScope,
        FindingSeverity,
        ReadinessFinding,
    )

    findings = ()
    if blocking:
        findings = (
            ReadinessFinding(
                scope=FindingScope.CONFIG,
                severity=FindingSeverity.BLOCKING,
                reason="test_blocking",
                message="configured dataset folder missing",
            ),
        )
    return ReadinessReport(
        profile="medium",
        findings=findings,
        quarantined_files=(),
        usable_files=("/tmp/a.wav",),
    )


class TestEntrypointReadiness:
    def test_blocking_findings_raise_with_messages(self, monkeypatch):
        monkeypatch.setattr(
            orchestration,
            "run_training_readiness",
            lambda *, settings, profile: _report(blocking=True),
        )
        with pytest.raises(TrainingNotReadyError, match="dataset folder missing"):
            ensure_entrypoint_readiness(settings=object(), profile="medium", smoke=False)

    def test_clean_report_returned_and_state_updated(self, monkeypatch):
        monkeypatch.setattr(
            orchestration,
            "run_training_readiness",
            lambda *, settings, profile: _report(blocking=False),
        )
        with training_operation_scope("medium") as state:
            report = ensure_entrypoint_readiness(
                settings=object(), profile="medium", smoke=False
            )
        assert report.usable_files == ("/tmp/a.wav",)
        assert state.readiness is report
        assert state.phase == "readiness_complete"

    def test_smoke_findings_merge_into_report(self, monkeypatch):
        from ser_tpu._internal.models import training_readiness

        monkeypatch.setattr(
            orchestration,
            "run_training_readiness",
            lambda *, settings, profile: _report(blocking=False),
        )

        from ser_tpu._internal.models.training_readiness import (
            FindingScope,
            FindingSeverity,
            ReadinessFinding,
        )

        smoke_finding = ReadinessFinding(
            scope=FindingScope.RESOURCE,
            severity=FindingSeverity.BLOCKING,
            reason="smoke_failed",
            message="backend smoke timed out",
        )
        monkeypatch.setattr(
            training_readiness,
            "run_backend_smoke",
            lambda **kwargs: [smoke_finding],
        )
        with pytest.raises(TrainingNotReadyError, match="smoke timed out"):
            ensure_entrypoint_readiness(settings=object(), profile="medium", smoke=True)


def test_readiness_report_persisted_at_default_path(monkeypatch, tmp_path):
    # Reference persists training-readiness-<profile>.json atomically
    # (training_readiness.py:870-873); the entrypoint writes it best-effort.
    import json
    from types import SimpleNamespace

    monkeypatch.setattr(
        orchestration,
        "run_training_readiness",
        lambda *, settings, profile: _report(blocking=False),
    )
    settings = SimpleNamespace(tmp_folder=tmp_path)
    ensure_entrypoint_readiness(settings=settings, profile="medium", smoke=False)
    target = tmp_path / "training-readiness-medium.json"
    assert target.exists()
    payload = json.loads(target.read_text())
    assert payload["profile"] == "medium"
    assert payload["blocking"] is False
    assert payload["usable_files"] == ["/tmp/a.wav"]
    assert not list(tmp_path.glob(".training-readiness-*"))  # staging temp cleaned
