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


# --------------------------------------------------------------------------- #
# Training-time containment (reference training_orchestration.py:577-790)
# --------------------------------------------------------------------------- #

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.models.training_orchestration import (
    QuarantineBudgetExceeded,
    bounded_retry_local_io,
    handle_sample_encoding_failure,
    record_cache_probe,
)
from ser_tpu._internal.utils.audio_io import AudioDecodeError


def _settings(tmp_path, **extra):
    env = {
        "SER_DATASET_FOLDER": str(tmp_path / "ds"),
        "SER_TMP_FOLDER": str(tmp_path / "tmp"),
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
    }
    env.update(extra)
    return build_settings_from_inputs(capture_settings_inputs(env=env))


class TestBoundedRetryLocalIO:
    def test_transient_errno_retries_then_succeeds(self, monkeypatch):
        monkeypatch.setattr(orchestration.time, "sleep", lambda _s: None)
        attempts = {"n": 0}

        def flaky():
            attempts["n"] += 1
            if attempts["n"] < 3:
                raise OSError(11, "Resource temporarily unavailable")
            return "payload"

        with training_operation_scope("medium") as state:
            assert bounded_retry_local_io(flaky, identity="x.wav") == "payload"
            assert state.bounded_retries == 2
            assert state.containment_counts["sample:media_decode_failed:bounded_retry"] == 2
        assert attempts["n"] == 3

    def test_non_transient_error_raises_immediately(self):
        attempts = {"n": 0}

        def corrupt():
            attempts["n"] += 1
            raise AudioDecodeError("bad RIFF")

        with pytest.raises(AudioDecodeError):
            bounded_retry_local_io(corrupt, identity="x.wav")
        assert attempts["n"] == 1

    def test_budget_exhaustion_reraises(self, monkeypatch):
        monkeypatch.setattr(orchestration.time, "sleep", lambda _s: None)

        def always_busy():
            raise OSError(16, "Device busy")

        with pytest.raises(OSError):
            bounded_retry_local_io(always_busy, identity="x.wav", max_retries=1)

    def test_jitter_is_deterministic_per_identity(self, monkeypatch):
        delays: list[float] = []
        monkeypatch.setattr(orchestration.time, "sleep", delays.append)
        for _ in range(2):
            attempts = {"n": 0}

            def flaky():
                attempts["n"] += 1
                if attempts["n"] == 1:
                    raise OSError(4, "Interrupted")
                return 1

            bounded_retry_local_io(flaky, identity="stable.wav")
        assert delays[0] == delays[1]


class TestHandleSampleEncodingFailure:
    def _vanished(self, tmp_path):
        clip = tmp_path / "ds" / "a.wav"
        return FileNotFoundError(2, "No such file", str(clip)), str(clip)

    def test_proven_missing_sample_quarantines_within_budget(self, tmp_path):
        (tmp_path / "ds").mkdir(parents=True)
        settings = _settings(tmp_path, SER_DATA_LOADER_MAX_FAILED_FILE_RATIO="0.5")
        err, clip = self._vanished(tmp_path)
        with training_operation_scope("medium") as state:
            assert handle_sample_encoding_failure(
                settings=settings,
                sample_path=clip,
                label="happy",
                error=err,
                all_labels=["happy"] * 4 + ["sad"] * 4,
                quarantined_labels=[],
            )
            assert state.quarantined_sample_paths == [clip]
            assert state.containment_counts["sample:sample_audio_missing:quarantine"] == 1

    def test_non_quarantine_failure_returns_false(self, tmp_path):
        (tmp_path / "ds").mkdir(parents=True)
        settings = _settings(tmp_path)
        assert not handle_sample_encoding_failure(
            settings=settings,
            sample_path=str(tmp_path / "ds" / "a.wav"),
            label="happy",
            error=RuntimeError("novel"),
            all_labels=["happy"],
            quarantined_labels=[],
        )

    def test_budget_violation_aborts(self, tmp_path):
        (tmp_path / "ds").mkdir(parents=True)
        settings = _settings(tmp_path, SER_DATA_LOADER_MAX_FAILED_FILES="0")
        err, clip = self._vanished(tmp_path)
        with pytest.raises(QuarantineBudgetExceeded, match="absolute"):
            handle_sample_encoding_failure(
                settings=settings,
                sample_path=clip,
                label="happy",
                error=err,
                all_labels=["happy"] * 8,
                quarantined_labels=[],
            )

    def test_class_floor_violation_aborts(self, tmp_path):
        (tmp_path / "ds").mkdir(parents=True)
        settings = _settings(
            tmp_path,
            SER_DATA_LOADER_MAX_FAILED_FILE_RATIO="1.0",
            SER_DATA_LOADER_MAX_FAILED_FILE_RATIO_PER_CLASS="1.0",
            SER_DATA_LOADER_MIN_REMAINING_PER_CLASS_SPLIT="2",
        )
        err, clip = self._vanished(tmp_path)
        with pytest.raises(QuarantineBudgetExceeded, match="floor"):
            handle_sample_encoding_failure(
                settings=settings,
                sample_path=clip,
                label="happy",
                error=err,
                all_labels=["happy", "happy", "sad", "sad", "sad"],
                quarantined_labels=["happy"],
            )


def test_record_cache_probe_counts_in_scope():
    with training_operation_scope("medium") as state:
        record_cache_probe(hit=True)
        record_cache_probe(hit=False)
        record_cache_probe(hit=False)
        assert (state.cache_hits, state.cache_misses) == (1, 2)
    record_cache_probe(hit=True)  # outside any scope: a no-op
