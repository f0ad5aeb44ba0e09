"""Per-owner tests for the doctor/preflight diagnostics service.

Parity surface: reference ``ser/_internal/diagnostics/service.py:113-470`` +
``ser/diagnostics/domain.py:8-70`` — structured findings (code/severity/
message/remediation/blocking), three renderers (JSON = ``report.to_dict()``),
and the fail policy (off → never; blocking → always; strict additionally on
warning-or-higher). These run against real settings built from an explicit
env dict (no ambient state).
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
    should_fail_preflight,
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
        # Re-home cache-derived paths (whisper_download_root writes below):
        # without this the root-as-file test would pollute the real user cache.
        "SER_CACHE_DIR": str(tmp_path / "cache"),
    }
    base.update(env)
    return build_settings_from_inputs(capture_settings_inputs(env=base))


def _by_code(report):
    return {f.code: f for f in report.findings}


def test_doctor_reports_every_core_check(tmp_path):
    report = run_doctor_diagnostics(settings=_settings(tmp_path))
    checks = _by_code(report)
    assert "accelerator" in checks
    assert checks["accelerator"].severity is DiagnosticSeverity.INFO
    for profile in ("fast", "medium", "accurate", "accurate-research"):
        assert f"profile.{profile}" in checks
    assert "media.ffmpeg" in checks
    assert "transcription.assets" in checks
    assert "models.fast_artifact" in checks
    assert "data.registry" in checks


def test_missing_artifacts_surface_as_warnings_not_errors(tmp_path):
    checks = _by_code(run_doctor_diagnostics(settings=_settings(tmp_path)))
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
    checks = _by_code(run_doctor_diagnostics(settings=settings))
    finding = checks["transcription.assets"]
    assert finding.severity is DiagnosticSeverity.WARNING
    assert "file, not a directory" in finding.message


def test_preflight_is_a_strict_subset_of_doctor(tmp_path):
    settings = _settings(tmp_path)
    doctor = {f.code for f in run_doctor_diagnostics(settings=settings).findings}
    preflight = {
        f.code
        for f in run_startup_preflight(
            settings=settings, include_transcription_checks=True
        ).findings
    }
    assert preflight < doctor
    without = {
        f.code
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
                code="ok", severity=DiagnosticSeverity.INFO, message="fine"
            ),
            DiagnosticFinding(
                code="warned",
                severity=DiagnosticSeverity.WARNING,
                message="issue",
                remediation=("do the thing",),
            ),
        )
    )


def test_render_styles_text_brief_json():
    report = _mixed_report()
    text = render_report(report, style="text")
    # Reference text format (service.py:193-218).
    assert text.startswith("SER diagnostics report")
    assert "summary: info=1 warning=1 error=0" in text
    assert "[INFO] ok: informational fine" in text
    assert "[WARNING] warned: advisory issue" in text
    assert "  remediation: do the thing" in text
    brief = render_report(report, style="brief")
    assert "fine" not in brief and "issue" in brief  # INFO suppressed
    parsed = json.loads(render_report(report, style="json"))
    # Reference payload: report.to_dict() — summary counts + findings.
    assert parsed["summary"]["counts"] == {"info": 1, "warning": 1, "error": 0}
    assert parsed["summary"]["has_warning_or_higher"] is True
    assert parsed["summary"]["has_blocking_findings"] is False
    assert [row["code"] for row in parsed["findings"]] == ["ok", "warned"]
    assert parsed["findings"][1]["severity"] == "warning"
    assert parsed["findings"][1]["remediation"] == ["do the thing"]


def test_brief_render_of_all_info_report_says_all_passed():
    report = DiagnosticReport(
        findings=(
            DiagnosticFinding(
                code="ok", severity=DiagnosticSeverity.INFO, message="fine"
            ),
        )
    )
    assert render_report(report, style="brief") == "All checks passed."


def test_preflight_abort_policy_matrix():
    # Reference service.py:184-191: off never aborts; any BLOCKING finding
    # always aborts; strict additionally aborts on warning-or-higher. A
    # non-blocking error does NOT abort warn mode.
    info = DiagnosticReport(
        findings=(
            DiagnosticFinding(code="a", severity=DiagnosticSeverity.INFO, message="s"),
        )
    )
    warn = _mixed_report()
    nonblocking_error = DiagnosticReport(
        findings=(
            DiagnosticFinding(code="b", severity=DiagnosticSeverity.ERROR, message="s"),
        )
    )
    blocking_error = DiagnosticReport(
        findings=(
            DiagnosticFinding(
                code="c",
                severity=DiagnosticSeverity.ERROR,
                message="s",
                blocking=True,
            ),
        )
    )
    assert not preflight_should_abort(blocking_error, "off")
    assert not preflight_should_abort(warn, "warn")
    assert not preflight_should_abort(nonblocking_error, "warn")
    assert preflight_should_abort(blocking_error, "warn")
    assert preflight_should_abort(warn, "strict")
    assert preflight_should_abort(nonblocking_error, "strict")
    assert not preflight_should_abort(info, "strict")
    # Reference-named alias.
    assert should_fail_preflight(report=blocking_error, mode="warn")


def test_report_to_dict_reference_shape():
    payload = _mixed_report().to_dict()
    assert set(payload) == {"summary", "findings"}
    assert set(payload["summary"]) == {
        "counts",
        "has_blocking_findings",
        "has_warning_or_higher",
        "has_error",
    }
    assert set(payload["findings"][0]) == {
        "code",
        "severity",
        "message",
        "blocking",
        "remediation",
    }


def test_noise_findings_are_info_only(monkeypatch):
    """--include-noise-findings adds INFO-level environment context without
    changing report severity (reference diagnostics/command.py:51-54)."""
    from ser_tpu._internal.config.bootstrap import reload_settings
    from ser_tpu._internal.diagnostics.service import run_doctor_diagnostics
    from ser_tpu.diagnostics.domain import DiagnosticSeverity

    settings = reload_settings()
    base = run_doctor_diagnostics(settings=settings, include_transcription_checks=False)
    noisy = run_doctor_diagnostics(
        settings=settings,
        include_transcription_checks=False,
        include_noise_findings=True,
    )
    extra = [f for f in noisy.findings if f.code.startswith("environment.")]
    assert extra, "noise lane must add environment.* findings"
    assert all(f.severity is DiagnosticSeverity.INFO for f in extra)
    assert noisy.has_error == base.has_error
    assert any(f.code == "environment.jax" for f in extra)


def test_staged_weight_findings_cover_encoder_profiles(tmp_path):
    """Doctor reports per-profile staged-weight readiness (VERDICT r04 #4):
    nothing staged -> WARNING with the staging remediation."""
    report = run_doctor_diagnostics(settings=_settings(tmp_path))
    checks = _by_code(report)
    for profile in ("medium", "accurate", "accurate-research"):
        finding = checks[f"models.staged.{profile}"]
        assert finding.severity is DiagnosticSeverity.WARNING
        assert "No staged weights" in finding.message


def test_separation_checkpoint_finding(tmp_path):
    """A configured separation checkpoint is validated: missing path warns,
    a converted .npz reports INFO with its architecture, a corrupt file
    warns instead of crashing the doctor."""
    # Missing path.
    settings = _settings(
        tmp_path, SER_SEPARATION_MODEL_PATH=str(tmp_path / "nope.npz")
    )
    checks = _by_code(run_doctor_diagnostics(settings=settings))
    finding = checks["models.staged.separation"]
    assert finding.severity is DiagnosticSeverity.WARNING
    assert "does not exist" in finding.message

    # Staged converted checkpoint (tiny, real converter round-trip).
    from ser_tpu.models.demucs_v4 import (
        DemucsV4Config,
        init_demucs_params,
        save_demucs_npz,
    )

    cfg = DemucsV4Config.tiny()
    path = tmp_path / "htdemucs_tiny.npz"
    save_demucs_npz(init_demucs_params(cfg), path, config=cfg)
    settings = _settings(tmp_path, SER_SEPARATION_MODEL_PATH=str(path))
    checks = _by_code(run_doctor_diagnostics(settings=settings))
    finding = checks["models.staged.separation"]
    assert finding.severity is DiagnosticSeverity.INFO
    assert "depth 2" in finding.message

    # Corrupt file: reported, not raised.
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    settings = _settings(tmp_path, SER_SEPARATION_MODEL_PATH=str(bad))
    checks = _by_code(run_doctor_diagnostics(settings=settings))
    finding = checks["models.staged.separation"]
    assert finding.severity is DiagnosticSeverity.WARNING


def test_separation_raw_th_checkpoint_validated_against_manifest(tmp_path):
    """A raw published-format .th package validates via the config-derived
    manifest; a doctored variant (missing tensor) is flagged."""
    import torch

    from ser_tpu.models._demucs_synthetic import synthetic_state_dict
    from ser_tpu.models.demucs_v4 import DemucsV4Config

    cfg = DemucsV4Config.tiny()
    kwargs = {
        "sources": list(cfg.sources),
        "audio_channels": cfg.audio_channels,
        "channels": cfg.channels,
        "depth": cfg.depth,
        "nfft": cfg.nfft,
        "bottom_channels": cfg.bottom_channels,
        "t_layers": cfg.t_layers,
        "t_heads": cfg.t_heads,
        "segment": cfg.segment_seconds,
        "samplerate": cfg.sample_rate,
    }
    state = {
        name: torch.from_numpy(value)
        for name, value in synthetic_state_dict(cfg, seed=0).items()
    }
    good = tmp_path / "htdemucs.th"
    torch.save({"klass": "HTDemucs", "kwargs": kwargs, "state": state}, good)
    settings = _settings(tmp_path, SER_SEPARATION_MODEL_PATH=str(good))
    finding = _by_code(run_doctor_diagnostics(settings=settings))[
        "models.staged.separation"
    ]
    assert finding.severity is DiagnosticSeverity.INFO
    assert "matches the expected layout" in finding.message

    doctored = dict(state)
    del doctored["encoder.0.conv.bias"]
    bad = tmp_path / "doctored.th"
    torch.save({"klass": "HTDemucs", "kwargs": kwargs, "state": doctored}, bad)
    settings = _settings(tmp_path, SER_SEPARATION_MODEL_PATH=str(bad))
    finding = _by_code(run_doctor_diagnostics(settings=settings))[
        "models.staged.separation"
    ]
    assert finding.severity is DiagnosticSeverity.WARNING
    assert "missing" in finding.message
