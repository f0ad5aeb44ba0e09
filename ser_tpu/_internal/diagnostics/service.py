"""Doctor + startup preflight diagnostics.

Parity surface: reference ``ser/_internal/diagnostics/service.py:113-470`` —
structured findings for runtime capability, media tooling, transcription
assets, dataset registry health, and model artifacts; text/brief/json
renderers; fail policy by mode (off/warn/strict). TPU addition: an
accelerator check reporting the visible JAX devices.
"""

from __future__ import annotations

import json
import shutil

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.runtime.backend_hooks import build_backend_hooks
from ser_tpu._internal.runtime.registry import resolve_runtime_capability
from ser_tpu.diagnostics.domain import (
    DiagnosticFinding,
    DiagnosticReport,
    DiagnosticSeverity,
    PreflightMode,
)
from ser_tpu.profiles import PROFILE_NAMES


def _check_accelerator() -> DiagnosticFinding:
    try:
        import jax

        devices = jax.devices()
        kinds = sorted({d.platform for d in devices})
        return DiagnosticFinding(
            check_id="accelerator",
            severity=DiagnosticSeverity.INFO,
            summary=f"{len(devices)} JAX device(s) visible ({', '.join(kinds)}).",
        )
    except Exception as err:  # pragma: no cover - broken jax install
        return DiagnosticFinding(
            check_id="accelerator",
            severity=DiagnosticSeverity.ERROR,
            summary="JAX device enumeration failed.",
            detail=str(err),
            remediation="Check the JAX installation and TPU runtime.",
        )


def _check_profiles(settings: AppConfig) -> list[DiagnosticFinding]:
    hooks = frozenset(build_backend_hooks(settings))
    findings = []
    for profile in PROFILE_NAMES:
        capability = resolve_runtime_capability(
            profile, settings=settings, available_hooks=hooks
        )
        if capability.available:
            findings.append(
                DiagnosticFinding(
                    check_id=f"profile.{profile}",
                    severity=DiagnosticSeverity.INFO,
                    summary=f"Profile {profile} available (backend {capability.backend_id}).",
                )
            )
        else:
            severity = (
                DiagnosticSeverity.WARNING
                if profile != "fast"
                else DiagnosticSeverity.ERROR
            )
            findings.append(
                DiagnosticFinding(
                    check_id=f"profile.{profile}",
                    severity=severity,
                    summary=f"Profile {profile} unavailable.",
                    detail=capability.message,
                    remediation="Enable the profile flag or install missing modules.",
                )
            )
    return findings


def _check_media_tooling() -> DiagnosticFinding:
    if shutil.which("ffmpeg"):
        return DiagnosticFinding(
            check_id="media.ffmpeg",
            severity=DiagnosticSeverity.INFO,
            summary="ffmpeg found on PATH.",
        )
    return DiagnosticFinding(
        check_id="media.ffmpeg",
        severity=DiagnosticSeverity.WARNING,
        summary="ffmpeg not found; only WAV decoding is available.",
        remediation="Install ffmpeg to decode non-WAV containers.",
    )


def _check_transcription_assets(settings: AppConfig) -> DiagnosticFinding:
    root = settings.models.whisper_download_root
    try:
        has_assets = root.exists() and any(root.iterdir())
    except NotADirectoryError:
        # A stray FILE at the configured root: the doctor diagnoses broken
        # setups — it must report this, not traceback on it.
        return DiagnosticFinding(
            check_id="transcription.assets",
            severity=DiagnosticSeverity.WARNING,
            summary=f"whisper_download_root {root} is a file, not a directory.",
            remediation="Remove the file and stage model assets in a directory.",
        )
    if has_assets:
        return DiagnosticFinding(
            check_id="transcription.assets",
            severity=DiagnosticSeverity.INFO,
            summary=f"Transcription model assets present under {root}.",
        )
    return DiagnosticFinding(
        check_id="transcription.assets",
        severity=DiagnosticSeverity.WARNING,
        summary="No transcription model assets found.",
        detail=f"Expected Whisper weights under {root}.",
        remediation="Pre-download Whisper weights or run with --no-transcript.",
    )


def _check_model_artifacts(settings: AppConfig) -> DiagnosticFinding:
    if settings.models.model_file.exists():
        return DiagnosticFinding(
            check_id="models.fast_artifact",
            severity=DiagnosticSeverity.INFO,
            summary=f"Fast-profile artifact present at {settings.models.model_file}.",
        )
    return DiagnosticFinding(
        check_id="models.fast_artifact",
        severity=DiagnosticSeverity.WARNING,
        summary="No trained fast-profile artifact found.",
        remediation="Run `ser --train` to fit the fast-profile head.",
    )


def _check_dataset_registry(settings: AppConfig) -> DiagnosticFinding:
    from ser_tpu._internal.data.registry import audit_registry_health

    issues = audit_registry_health(settings=settings)
    if not issues:
        return DiagnosticFinding(
            check_id="data.registry",
            severity=DiagnosticSeverity.INFO,
            summary="Dataset registry healthy.",
        )
    return DiagnosticFinding(
        check_id="data.registry",
        severity=DiagnosticSeverity.WARNING,
        summary=f"Dataset registry has {len(issues)} issue(s).",
        detail="; ".join(issue.message for issue in issues[:5]),
        remediation="Run `ser data prepare` or repair the registry entries.",
    )


def run_doctor_diagnostics(
    *,
    settings: AppConfig,
    include_transcription_checks: bool = True,
    include_training_readiness: bool = False,
) -> DiagnosticReport:
    """Runs the full doctor check suite (optionally + training readiness)."""
    findings: list[DiagnosticFinding] = [_check_accelerator()]
    findings.extend(_check_profiles(settings))
    findings.append(_check_media_tooling())
    if include_transcription_checks:
        findings.append(_check_transcription_assets(settings))
    findings.append(_check_model_artifacts(settings))
    findings.append(_check_dataset_registry(settings))
    if include_training_readiness:
        findings.extend(_check_training_readiness(settings))
    return DiagnosticReport(findings=tuple(findings))


def _check_training_readiness(settings: AppConfig) -> list[DiagnosticFinding]:
    """Full readiness run surfaced as doctor findings (reference service.py:133-182)."""
    from ser_tpu._internal.models.training_readiness import run_training_readiness

    try:
        report = run_training_readiness(settings=settings, profile="fast")
    except Exception as err:  # noqa: BLE001 - readiness crash is itself a finding
        return [
            DiagnosticFinding(
                check_id="training.readiness",
                severity=DiagnosticSeverity.ERROR,
                summary="Training readiness crashed.",
                detail=str(err),
            )
        ]
    severity = (
        DiagnosticSeverity.ERROR
        if report.blocking
        else (DiagnosticSeverity.WARNING if report.findings else DiagnosticSeverity.INFO)
    )
    return [
        DiagnosticFinding(
            check_id="training.readiness",
            severity=severity,
            summary=(
                f"Readiness: usable={len(report.usable_files)} "
                f"quarantined={len(report.quarantined_files)} blocking={report.blocking}."
            ),
            detail="; ".join(f.message for f in report.findings[:5]),
        )
    ]


def run_startup_preflight(
    *,
    settings: AppConfig,
    include_transcription_checks: bool,
) -> DiagnosticReport:
    """Lighter preflight used by the CLI gate before inference."""
    findings: list[DiagnosticFinding] = [_check_accelerator()]
    findings.extend(_check_profiles(settings))
    if include_transcription_checks:
        findings.append(_check_transcription_assets(settings))
    findings.append(_check_model_artifacts(settings))
    return DiagnosticReport(findings=tuple(findings))


def render_report(report: DiagnosticReport, *, style: str = "text") -> str:
    """Renders one report as text, brief, or json."""
    if style == "json":
        return json.dumps(
            [
                {
                    "check_id": f.check_id,
                    "severity": f.severity.value,
                    "summary": f.summary,
                    "detail": f.detail,
                    "remediation": f.remediation,
                }
                for f in report.findings
            ],
            indent=2,
        )
    icons = {
        DiagnosticSeverity.INFO: "ok",
        DiagnosticSeverity.WARNING: "warn",
        DiagnosticSeverity.ERROR: "FAIL",
    }
    lines = []
    for finding in report.findings:
        if style == "brief" and finding.severity is DiagnosticSeverity.INFO:
            continue
        line = f"[{icons[finding.severity]:>4}] {finding.check_id}: {finding.summary}"
        if style == "text" and finding.detail:
            line += f"\n       {finding.detail}"
        if style == "text" and finding.remediation:
            line += f"\n       → {finding.remediation}"
        lines.append(line)
    return "\n".join(lines) if lines else "All checks passed."


def preflight_should_abort(report: DiagnosticReport, mode: PreflightMode) -> bool:
    """Fail policy by mode (reference service.py:184-191)."""
    if mode == "off":
        return False
    if mode == "warn":
        return report.has_errors
    return report.has_errors or report.has_warnings


__all__ = [
    "preflight_should_abort",
    "render_report",
    "run_doctor_diagnostics",
    "run_startup_preflight",
]
