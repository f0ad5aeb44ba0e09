"""Training run orchestration: ContextVar-scoped run state + readiness gating.

Parity surface: reference ``ser/_internal/models/training_orchestration.py``
— ``TrainingRunState`` scoped via ContextVar (``:85-173``), entrypoint
readiness enforcement (``:529-580``), and the dry-run / prepare-only /
prepared-plan mode dispatch.
"""

from __future__ import annotations

import time
import uuid
from collections.abc import Iterator
from contextlib import contextmanager
from contextvars import ContextVar
from dataclasses import dataclass, field

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.models.training_readiness import (
    ReadinessReport,
    run_training_readiness,
)
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.profiles import ProfileName

logger = get_logger(__name__)


class TrainingNotReadyError(RuntimeError):
    """Raised when blocking readiness findings prevent training."""


@dataclass
class TrainingRunState:
    """Mutable state for one training operation scope."""

    operation_id: str
    profile: ProfileName
    started_at_unix: float
    phase: str = "pending"
    readiness: ReadinessReport | None = None
    notes: list[str] = field(default_factory=list)


_active_run: ContextVar[TrainingRunState | None] = ContextVar(
    "ser_tpu_training_run", default=None
)


def current_training_run() -> TrainingRunState | None:
    """The active training run state, when inside a scope."""
    return _active_run.get()


@contextmanager
def training_operation_scope(profile: ProfileName) -> Iterator[TrainingRunState]:
    """Opens one training operation scope (reference ``:163``)."""
    state = TrainingRunState(
        operation_id=uuid.uuid4().hex[:12],
        profile=profile,
        started_at_unix=time.time(),
    )
    token = _active_run.set(state)
    logger.info("Training operation %s started (profile=%s).", state.operation_id, profile)
    try:
        yield state
    finally:
        _active_run.reset(token)
        logger.info(
            "Training operation %s finished in %.1fs (phase=%s).",
            state.operation_id,
            time.time() - state.started_at_unix,
            state.phase,
        )


def ensure_entrypoint_readiness(
    *, settings: AppConfig, profile: ProfileName, smoke: bool = True, backend=None
) -> ReadinessReport:
    """Runs readiness (+ backend smoke) and raises on blocking findings.

    Reference ``:529-580``: the smoke encodes one real clip through the
    SELECTED backend under a hard wall-clock deadline
    (``training_orchestration.py:458-476``) so a hung or miswired backend
    fails here, not mid-training.
    """
    report = run_training_readiness(settings=settings, profile=profile)
    if smoke and not report.blocking:
        from ser_tpu._internal.models.training_readiness import run_backend_smoke

        smoke_findings = run_backend_smoke(
            settings=settings,
            profile=profile,
            usable_files=report.usable_files,
            usable_records=report.usable_records,
            backend=backend,
        )
        if smoke_findings:
            report = ReadinessReport(
                profile=report.profile,
                findings=report.findings + tuple(smoke_findings),
                quarantined_files=report.quarantined_files,
                usable_files=report.usable_files,
            )
    state = current_training_run()
    if state is not None:
        state.readiness = report
        state.phase = "readiness_complete"
    try:
        from ser_tpu._internal.models.training_readiness import write_readiness_report

        write_readiness_report(report, settings=settings)
    except Exception as err:  # noqa: BLE001 - audit artifact must not block training
        logger.warning("Could not persist readiness report: %s", err)
    if report.blocking:
        blocking = [f for f in report.findings if f.severity.value == "blocking"]
        raise TrainingNotReadyError(
            f"Training readiness failed with {len(blocking)} blocking finding(s): "
            + "; ".join(f.message for f in blocking[:3])
        )
    return report


__all__ = [
    "TrainingNotReadyError",
    "TrainingRunState",
    "current_training_run",
    "ensure_entrypoint_readiness",
    "training_operation_scope",
]
