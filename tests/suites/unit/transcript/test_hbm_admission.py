"""Per-owner tests for ``_internal/transcript/hbm_admission.py``.

Behavior spec: reference ``ser/_internal/transcript/mps_admission.py:50-441``
— footprint estimate vs free memory with headroom + safety margins, and
calibration-report overrides that waive the MARGINS but never the live
free-memory check.
"""

from __future__ import annotations

import dataclasses
import time

import pytest

from ser_tpu._internal.config.schema import TranscriptionConfig
from ser_tpu._internal.transcript import hbm_admission
from ser_tpu._internal.transcript.hbm_admission import (
    admit_transcription_model,
    calibration_admission_override,
    estimate_model_footprint_mb,
)
from ser_tpu._internal.transcript.profiling import CalibrationRecommendation


def _write_report(path, *, model="large-v3", confidence="high", age_hours=0.0):
    from ser_tpu._internal.transcript.profiling import save_calibration_report

    recommendation = CalibrationRecommendation(
        backend_id="jax_whisper",
        model_name=model,
        confidence=confidence,
        mean_wer=0.08,
        p50_latency_seconds=1.5,
        generated_at_unix=time.time() - age_hours * 3600.0,
    )
    save_calibration_report(recommendation, [], path)
    return path


def _config(**overrides) -> TranscriptionConfig:
    return dataclasses.replace(TranscriptionConfig(), **overrides)


class TestFootprint:
    def test_known_models_scale_with_params(self):
        assert estimate_model_footprint_mb("tiny") < estimate_model_footprint_mb(
            "small"
        ) < estimate_model_footprint_mb("large-v3")

    def test_unknown_model_assumes_largest(self):
        assert estimate_model_footprint_mb("mystery-model") == estimate_model_footprint_mb(
            "large-v3"
        )

    def test_case_insensitive(self):
        assert estimate_model_footprint_mb("Large-V3") == estimate_model_footprint_mb(
            "large-v3"
        )


class TestAdmission:
    def test_disabled_control_admits(self, monkeypatch):
        monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 1.0)
        decision = admit_transcription_model(
            "large-v3", config=_config(hbm_admission_control_enabled=False)
        )
        assert decision.admitted and "disabled" in decision.reason

    def test_insufficient_memory_rejects_with_actionable_reason(self, monkeypatch):
        monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 100.0)
        decision = admit_transcription_model("large-v3", config=_config())
        assert not decision.admitted
        assert "smaller transcription model" in decision.reason
        assert decision.free_memory_mb == 100.0

    def test_sufficient_memory_admits(self, monkeypatch):
        monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 64000.0)
        decision = admit_transcription_model("large-v3", config=_config())
        assert decision.admitted

    def test_margins_gate_the_borderline_case(self, monkeypatch):
        footprint = estimate_model_footprint_mb("large-v3")
        config = _config(
            hbm_admission_min_headroom_mb=256.0, hbm_admission_safety_margin_mb=256.0
        )
        monkeypatch.setattr(
            hbm_admission, "device_free_memory_mb", lambda: footprint + 100.0
        )
        assert not admit_transcription_model("large-v3", config=config).admitted
        monkeypatch.setattr(
            hbm_admission, "device_free_memory_mb", lambda: footprint + 513.0
        )
        assert admit_transcription_model("large-v3", config=config).admitted

    def test_stats_unavailable_admits_openly(self, monkeypatch):
        monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: None)
        decision = admit_transcription_model("large-v3", config=_config())
        assert decision.admitted and "unavailable" in decision.reason


class TestCalibrationOverride:
    def test_fresh_high_confidence_report_overrides(self, tmp_path):
        report = _write_report(tmp_path / "calibration.json")
        config = _config(calibration_report_path=report)
        reason = calibration_admission_override("large-v3", config)
        assert reason is not None and "confidence=high" in reason

    def test_override_waives_margins_not_free_memory_check(self, tmp_path, monkeypatch):
        report = _write_report(tmp_path / "calibration.json")
        config = _config(calibration_report_path=report)
        footprint = estimate_model_footprint_mb("large-v3")
        # Free memory above the bare footprint but below footprint+margins:
        # the override admits (margins waived)...
        monkeypatch.setattr(
            hbm_admission, "device_free_memory_mb", lambda: footprint + 10.0
        )
        assert admit_transcription_model("large-v3", config=config).admitted
        # ...but free memory below the bare footprint still rejects.
        monkeypatch.setattr(
            hbm_admission, "device_free_memory_mb", lambda: footprint - 10.0
        )
        assert not admit_transcription_model("large-v3", config=config).admitted

    def test_stale_report_is_ignored(self, tmp_path):
        report = _write_report(tmp_path / "calibration.json", age_hours=1000.0)
        config = _config(calibration_report_path=report)
        assert calibration_admission_override("large-v3", config) is None

    def test_wrong_model_is_ignored(self, tmp_path):
        report = _write_report(tmp_path / "calibration.json", model="small")
        config = _config(calibration_report_path=report)
        assert calibration_admission_override("large-v3", config) is None

    def test_low_confidence_below_floor_is_ignored(self, tmp_path):
        report = _write_report(tmp_path / "calibration.json", confidence="low")
        config = _config(
            calibration_report_path=report, calibration_min_confidence="high"
        )
        assert calibration_admission_override("large-v3", config) is None
        relaxed = _config(
            calibration_report_path=report, calibration_min_confidence="low"
        )
        assert calibration_admission_override("large-v3", relaxed) is not None

    def test_overrides_disabled(self, tmp_path):
        report = _write_report(tmp_path / "calibration.json")
        config = _config(
            calibration_report_path=report, calibration_overrides_enabled=False
        )
        assert calibration_admission_override("large-v3", config) is None

    def test_default_report_path_consulted_when_unconfigured(self, tmp_path):
        report = _write_report(tmp_path / "default.json")
        config = _config(calibration_report_path=None)
        assert (
            calibration_admission_override(
                "large-v3", config, default_report_path=report
            )
            is not None
        )

    def test_missing_report_is_none(self, tmp_path):
        config = _config(calibration_report_path=tmp_path / "absent.json")
        assert calibration_admission_override("large-v3", config) is None
