"""Public API facade for runtime, dataset, and diagnostics workflows.

Parity surface: reference ``ser/api.py`` — the same ``__all__`` workflow
symbols (``infer``, ``train``, ``list_profiles``, ``load_profile``, dataset
operations, ``run_startup_preflight``) with identical signatures, so reference
users can switch imports from ``ser`` to ``ser_tpu`` unchanged.
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path
from typing import Protocol

import ser_tpu._internal.api.data as _data_api
import ser_tpu._internal.api.diagnostics as _diagnostics_api
import ser_tpu._internal.api.runtime as _runtime_api
from ser_tpu.config import (
    AccurateResearchRuntimeConfig, AccurateRuntimeConfig, AppConfig, AudioReadConfig,
    DataLoaderConfig, DatasetConfig, FastRuntimeConfig, FeatureFlags,
    FeatureRuntimeBackendOverride, FeatureRuntimePolicyConfig, MediumRuntimeConfig,
    MediumTrainingConfig, ModelsConfig, NeuralNetConfig, QualityGateConfig,
    RuntimeFlags, SchemaConfig, TimelineConfig, TorchRuntimeConfig, TrainingConfig,
    TranscriptionConfig, WhisperModelConfig, reload_settings,
)
from ser_tpu.diagnostics.domain import DiagnosticFinding, DiagnosticReport, DiagnosticSeverity
from ser_tpu.domain import DatasetConsents, EmotionSegment, TimelineEntry, TranscriptWord
from ser_tpu.profiles import ProfileName
from ser_tpu.runtime.contracts import InferenceExecution, InferenceRequest, SubtitleFormat
from ser_tpu.runtime.schema import FramePrediction, InferenceResult, SegmentPrediction

ComplianceMode = _data_api.ComplianceMode
DatasetPrepareResult = _data_api.DatasetPrepareResult
DatasetRegistryHealthIssueRecord = _data_api.DatasetRegistryHealthIssueRecord
DatasetRegistryRecord = _data_api.DatasetRegistryRecord


class RuntimePipeline(Protocol):
    """Minimal runtime pipeline contract exposed at the public API facade."""

    def run_training(self) -> None:
        """Runs training for the active profile."""
        ...

    def run_inference(self, request: InferenceRequest) -> InferenceExecution:
        """Runs inference for one audio request."""
        ...


type RuntimePipelineBuilder = Callable[[AppConfig], RuntimePipeline]


def _resolve_boundary_settings(settings: AppConfig | None) -> AppConfig:
    """Explicit settings or a boundary-local reloaded snapshot."""
    return settings if settings is not None else reload_settings()


def list_datasets() -> tuple[str, ...]:
    """Returns all supported dataset identifiers in deterministic order."""
    return _data_api.list_datasets()


def list_registered_datasets(
    *, settings: AppConfig | None = None
) -> tuple[DatasetRegistryRecord, ...]:
    """Returns registered dataset records."""
    return _data_api.list_registered_datasets(settings=_resolve_boundary_settings(settings))


def list_dataset_registry_health_issues(
    *, settings: AppConfig | None = None
) -> tuple[DatasetRegistryHealthIssueRecord, ...]:
    """Returns dataset registry health issues."""
    return _data_api.list_dataset_registry_health_issues(
        settings=_resolve_boundary_settings(settings)
    )


def show_dataset_consents(*, settings: AppConfig | None = None) -> DatasetConsents:
    """Returns persisted dataset consents."""
    return _data_api.show_dataset_consents(settings=_resolve_boundary_settings(settings))


def configure_dataset_consents(
    *,
    accept_policy_ids: tuple[str, ...] = (),
    accept_license_ids: tuple[str, ...] = (),
    settings: AppConfig | None = None,
    source: str = "ser_tpu.api.configure_dataset_consents",
) -> DatasetConsents:
    """Persists dataset consents."""
    return _data_api.configure_dataset_consents(
        accept_policy_ids=accept_policy_ids,
        accept_license_ids=accept_license_ids,
        settings=_resolve_boundary_settings(settings),
        source=source,
    )


def prepare_dataset(
    *,
    dataset_id: str,
    dataset_root: Path | None = None,
    manifest_path: Path | None = None,
    labels_csv_path: Path | None = None,
    audio_base_dir: Path | None = None,
    source_repo_id: str | None = None,
    source_revision: str | None = None,
    default_language: str | None = None,
    skip_download: bool = False,
    accept_license: bool = False,
    compliance_mode: ComplianceMode = "advisory",
    settings: AppConfig | None = None,
) -> DatasetPrepareResult:
    """Runs programmatic dataset preparation."""
    options = dict(locals())
    options["settings"] = _resolve_boundary_settings(settings)
    return _data_api.prepare_dataset(**options)


def list_profiles() -> tuple[ProfileName, ...]:
    """Returns all registered runtime profile names."""
    return _runtime_api.list_profiles()


def load_profile(profile: ProfileName, *, settings: AppConfig | None = None) -> None:
    """Validates one runtime profile."""
    return _runtime_api.load_profile(profile, settings=_resolve_boundary_settings(settings))


def train(
    *,
    profile: ProfileName | None = None,
    settings: AppConfig | None = None,
    pipeline_builder: RuntimePipelineBuilder | None = None,
) -> None:
    """Runs training via the runtime pipeline."""
    return _runtime_api.train(
        profile=profile,
        settings=_resolve_boundary_settings(settings),
        pipeline_builder=pipeline_builder,
    )


def infer(
    file_path: str | Path,
    *,
    profile: ProfileName | None = None,
    language: str | None = None,
    save_transcript: bool = False,
    include_transcript: bool = True,
    subtitle_output_path: str | None = None,
    subtitle_format: SubtitleFormat | None = None,
    settings: AppConfig | None = None,
    pipeline_builder: RuntimePipelineBuilder | None = None,
) -> InferenceExecution:
    """Runs inference for one audio file."""
    options = dict(locals())
    del options["file_path"]
    options["settings"] = _resolve_boundary_settings(settings)
    return _runtime_api.infer(file_path, **options)


def run_startup_preflight(
    *,
    include_transcription_checks: bool,
    settings: AppConfig | None = None,
) -> DiagnosticReport:
    """Runs structured startup diagnostics."""
    return _diagnostics_api.run_startup_preflight(
        settings=_resolve_boundary_settings(settings),
        include_transcription_checks=include_transcription_checks,
    )


__all__ = [
    "AccurateResearchRuntimeConfig", "AccurateRuntimeConfig", "AppConfig", "AudioReadConfig",
    "ComplianceMode", "DataLoaderConfig", "DatasetConfig", "DatasetConsents",
    "DatasetPrepareResult", "DatasetRegistryHealthIssueRecord", "DatasetRegistryRecord", "DiagnosticFinding",
    "DiagnosticReport", "DiagnosticSeverity", "EmotionSegment", "FastRuntimeConfig",
    "FeatureFlags", "FeatureRuntimeBackendOverride", "FeatureRuntimePolicyConfig", "FramePrediction",
    "InferenceExecution", "InferenceRequest", "InferenceResult", "MediumRuntimeConfig",
    "MediumTrainingConfig", "ModelsConfig", "NeuralNetConfig", "ProfileName",
    "QualityGateConfig", "RuntimeFlags", "RuntimePipeline", "RuntimePipelineBuilder",
    "SchemaConfig", "SegmentPrediction", "SubtitleFormat", "TimelineConfig",
    "TimelineEntry", "TorchRuntimeConfig", "TrainingConfig", "TranscriptWord",
    "TranscriptionConfig", "WhisperModelConfig", "configure_dataset_consents", "infer",
    "list_dataset_registry_health_issues", "list_datasets", "list_profiles", "list_registered_datasets",
    "load_profile", "prepare_dataset", "run_startup_preflight", "show_dataset_consents",
    "train",
]
