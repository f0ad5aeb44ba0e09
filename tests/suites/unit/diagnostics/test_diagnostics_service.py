"""Per-owner tests for the doctor/preflight diagnostics service.

Parity surface: reference ``ser/_internal/diagnostics/service.py:113-470`` —
structured findings, three renderers, fail policy by mode. These run against
real settings built from an explicit env dict (no ambient state).
"""

import json

from ser_tpu._internal.api import diagnostics as api_diagnostics
from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.diagnostics.service import (
    preflight_should_abort,
    render_report,
    run_doctor_diagnostics,
    run_startup_preflight,
)
from ser_tpu.diagnostics.domain import (
    DiagnosticFinding,
    DiagnosticReport,
    DiagnosticSeverity,
)


def _settings(tmp_path, **env):
    base = {
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
        "SER_TRANSCRIPTS_FOLDER": str(tmp_path / "transcripts"),
    }
    base.update(env)
    return build_settings_from_inputs(capture_settings_inputs(env=base))


def _by_check(report):
    return {f.check_id: f for f in report.findings}


def test_doctor_reports_every_core_check(tmp_path):
    report = run_doctor_diagnostics(settings=_settings(tmp_path))
    checks = _by_check(report)
    assert "accelerator" in checks
    assert checks["accelerator"].severity is DiagnosticSeverity.INFO
    for profile in ("fast", "medium", "accurate", "accurate-research"):
        assert f"profile.{profile}" in checks
    assert "media.ffmpeg" in checks
    assert "transcription.assets" in checks
    assert "models.fast_artifact" in checks
    assert "data.registry" in checks


def test_missing_artifacts_surface_as_warnings_not_errors(tmp_path):
    checks = _by_check(run_doctor_diagnostics(settings=_settings(tmp_path)))
    # Nothing is staged in tmp_path: assets/artifacts are warnings with
    # remediation, never crashes.
    assert checks["transcription.assets"].severity is DiagnosticSeverity.WARNING
    assert checks["models.fast_artifact"].severity is DiagnosticSeverity.WARNING
    assert checks["models.fast_artifact"].remediation


def test_whisper_root_as_file_is_diagnosed_not_raised(tmp_path):
    settings = _settings(tmp_path)
    root = settings.models.whisper_download_root
    root.parent.mkdir(parents=True, exist_ok=True)
    root.write_text("not a directory")
    checks = _by_check(run_doctor_diagnostics(settings=settings))
    finding = checks["transcription.assets"]
    assert finding.severity is DiagnosticSeverity.WARNING
    assert "file, not a directory" in finding.summary


def test_preflight_is_a_strict_subset_of_doctor(tmp_path):
    settings = _settings(tmp_path)
    doctor = {f.check_id for f in run_doctor_diagnostics(settings=settings).findings}
    preflight = {
        f.check_id
        for f in run_startup_preflight(
            settings=settings, include_transcription_checks=True
        ).findings
    }
    assert preflight < doctor
    without = {
        f.check_id
        for f in run_startup_preflight(
            settings=settings, include_transcription_checks=False
        ).findings
    }
    assert "transcription.assets" not in without


def test_internal_api_wrappers_delegate(tmp_path):
    settings = _settings(tmp_path)
    report = api_diagnostics.run_startup_preflight(
        settings=settings, include_transcription_checks=False
    )
    assert isinstance(report, DiagnosticReport)
    assert api_diagnostics.run_doctor_diagnostics(settings=settings).findings


def _mixed_report():
    return DiagnosticReport(
        findings=(
            DiagnosticFinding(
                check_id="ok", severity=DiagnosticSeverity.INFO, summary="fine"
            ),
            DiagnosticFinding(
                check_id="warned",
                severity=DiagnosticSeverity.WARNING,
                summary="issue",
                detail="ctx",
                remediation="do the thing",
            ),
        )
    )


def test_render_styles_text_brief_json():
    report = _mixed_report()
    text = render_report(report, style="text")
    assert "ok: fine" in text and "do the thing" in text
    brief = render_report(report, style="brief")
    assert "fine" not in brief and "issue" in brief  # INFO suppressed
    parsed = json.loads(render_report(report, style="json"))
    assert [row["check_id"] for row in parsed] == ["ok", "warned"]
    assert parsed[1]["severity"] == "warning"


def test_brief_render_of_all_info_report_says_all_passed():
    report = DiagnosticReport(
        findings=(
            DiagnosticFinding(
                check_id="ok", severity=DiagnosticSeverity.INFO, summary="fine"
            ),
        )
    )
    assert render_report(report, style="brief") == "All checks passed."


def test_preflight_abort_policy_matrix():
    info = DiagnosticReport(
        findings=(
            DiagnosticFinding(
                check_id="a", severity=DiagnosticSeverity.INFO, summary="s"
            ),
        )
    )
    warn = _mixed_report()
    error = DiagnosticReport(
        findings=(
            DiagnosticFinding(
                check_id="b", severity=DiagnosticSeverity.ERROR, summary="s"
            ),
        )
    )
    assert not preflight_should_abort(error, "off")
    assert not preflight_should_abort(warn, "warn")
    assert preflight_should_abort(error, "warn")
    assert preflight_should_abort(warn, "strict")
    assert not preflight_should_abort(info, "strict")
