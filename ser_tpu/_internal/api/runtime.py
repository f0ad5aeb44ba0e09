"""Internal runtime API: profile overrides, workflow runners.

Parity surface: reference ``ser/_internal/api/runtime.py`` —
``apply_cli_profile_override`` (``:80-159``) projects one requested profile
into runtime flags + artifact naming + transcription defaults;
``run_inference_workflow`` (``:285-308``) builds the pipeline and executes the
request; ``infer``/``train`` (``:311-339``) are the library-facing operations.
"""

from __future__ import annotations

import dataclasses
from collections.abc import Callable
from pathlib import Path

from ser_tpu._internal.config.bootstrap import reload_settings, settings_override
from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.runtime.pipeline import create_runtime_pipeline
from ser_tpu._internal.runtime.registry import (
    ensure_profile_supported,
    resolve_runtime_capability,
)
from ser_tpu.profiles import PROFILE_NAMES, ProfileName, get_profile_catalog
from ser_tpu.runtime.contracts import InferenceExecution, InferenceRequest, SubtitleFormat

type PipelineBuilder = Callable[[AppConfig], object]


def list_profiles() -> tuple[ProfileName, ...]:
    """All registered runtime profile names."""
    return PROFILE_NAMES


def apply_cli_profile_override(
    settings: AppConfig, profile: ProfileName | None
) -> AppConfig:
    """Projects one requested profile into the settings snapshot."""
    if profile is None:
        return settings
    if profile not in PROFILE_NAMES:
        raise ValueError(f"Unknown profile {profile!r}. Expected one of {PROFILE_NAMES}.")
    flags = dataclasses.replace(
        settings.runtime_flags,
        profile_pipeline=True,
        medium_profile=profile == "medium",
        accurate_profile=profile == "accurate",
        accurate_research_profile=profile == "accurate-research",
    )
    tx_defaults = get_profile_catalog()[profile].transcription_defaults
    transcription = dataclasses.replace(
        settings.transcription,
        backend_id=tx_defaults.backend_id,
        use_demucs=tx_defaults.use_demucs,
        use_vad=tx_defaults.use_vad,
    )
    return dataclasses.replace(settings, runtime_flags=flags, transcription=transcription)


def _settings_for_profile(
    profile: ProfileName | None, settings: AppConfig
) -> AppConfig:
    return apply_cli_profile_override(settings, profile)


def load_profile(profile: ProfileName, *, settings: AppConfig) -> None:
    """Validates that one profile can run under the given settings."""
    resolved = _settings_for_profile(profile, settings)
    from ser_tpu._internal.runtime.backend_hooks import build_backend_hooks

    hooks = build_backend_hooks(resolved)
    capability = resolve_runtime_capability(
        profile, settings=resolved, available_hooks=frozenset(hooks)
    )
    ensure_profile_supported(capability)


def run_inference_workflow(
    request: InferenceRequest,
    *,
    settings: AppConfig,
    pipeline_builder: PipelineBuilder | None = None,
) -> InferenceExecution:
    """Builds the pipeline under scoped settings and runs one request."""
    builder = pipeline_builder if pipeline_builder is not None else create_runtime_pipeline
    with settings_override(settings):
        pipeline = builder(settings)
        return pipeline.run_inference(request)  # type: ignore[attr-defined]


def infer(
    file_path: str | Path,
    *,
    profile: ProfileName | None = None,
    language: str | None = None,
    save_transcript: bool = False,
    include_transcript: bool = True,
    subtitle_output_path: str | None = None,
    subtitle_format: SubtitleFormat | None = None,
    settings: AppConfig,
    pipeline_builder: PipelineBuilder | None = None,
) -> InferenceExecution:
    """Library inference entry point."""
    resolved = _settings_for_profile(profile, settings)
    request = InferenceRequest(
        file_path=str(file_path),
        language=language if language is not None else resolved.default_language,
        save_transcript=save_transcript,
        include_transcript=include_transcript,
        subtitle_output_path=subtitle_output_path,
        subtitle_format=subtitle_format,
    )
    return run_inference_workflow(
        request, settings=resolved, pipeline_builder=pipeline_builder
    )


def train(
    *,
    profile: ProfileName | None = None,
    settings: AppConfig,
    pipeline_builder: PipelineBuilder | None = None,
) -> None:
    """Library training entry point."""
    resolved = _settings_for_profile(profile, settings)
    builder = pipeline_builder if pipeline_builder is not None else create_runtime_pipeline
    with settings_override(resolved):
        pipeline = builder(resolved)
        pipeline.run_training()  # type: ignore[attr-defined]


__all__ = [
    "apply_cli_profile_override",
    "infer",
    "list_profiles",
    "load_profile",
    "run_inference_workflow",
    "train",
]
