"""Diagnostics domain types (reference ``ser/diagnostics/domain.py:8-70`` parity)."""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import Literal

type PreflightMode = Literal["off", "warn", "strict"]


class DiagnosticSeverity(str, Enum):
    """Severity levels for diagnostic findings."""

    INFO = "info"
    WARNING = "warning"
    ERROR = "error"


@dataclass(frozen=True)
class DiagnosticFinding:
    """One structured diagnostics check result."""

    check_id: str
    severity: DiagnosticSeverity
    summary: str
    detail: str = ""
    remediation: str = ""


@dataclass(frozen=True)
class DiagnosticReport:
    """Aggregated diagnostics findings for one doctor/preflight run."""

    findings: tuple[DiagnosticFinding, ...] = field(default_factory=tuple)

    @property
    def has_errors(self) -> bool:
        return any(f.severity is DiagnosticSeverity.ERROR for f in self.findings)

    @property
    def has_warnings(self) -> bool:
        return any(f.severity is DiagnosticSeverity.WARNING for f in self.findings)

    def findings_for(self, severity: DiagnosticSeverity) -> tuple[DiagnosticFinding, ...]:
        return tuple(f for f in self.findings if f.severity is severity)


__all__ = ["DiagnosticFinding", "DiagnosticReport", "DiagnosticSeverity", "PreflightMode"]
