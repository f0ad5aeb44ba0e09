"""Runtime pipeline seam: the injected-callable orchestration core.

Parity surface: reference ``ser/_internal/runtime/pipeline.py`` —
``RuntimePipeline`` is a frozen dataclass of injected callables
(``:267-376`` wiring), and ``run_inference`` (``:152-264``) drives:
capability check → emotion inference via backend hook → transcript →
timeline build/print/save with per-phase timings.

TPU note: the reference frees torch accelerator memory between emotion
inference and transcription (``:93-122``); on TPU both stages share one
XLA client and live arrays are dropped when their Python references die, so
no explicit release step exists.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.runtime import phases
from ser_tpu._internal.runtime.backend_hooks import BackendHook, build_backend_hooks
from ser_tpu._internal.runtime.environment_plan import (
    build_runtime_environment_plan,
    temporary_process_env,
)
from ser_tpu._internal.runtime.registry import (
    ensure_profile_supported,
    resolve_runtime_capability,
)
from ser_tpu._internal.transcript.extractor import extract_transcript
from ser_tpu._internal.utils import subtitles as subtitles_utils
from ser_tpu._internal.utils import timeline as timeline_utils
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.domain import EmotionSegment, TimelineEntry, TranscriptWord
from ser_tpu.profiles import ProfileName, resolve_profile_name
from ser_tpu.runtime.contracts import InferenceExecution, InferenceRequest
from ser_tpu.runtime.schema import InferenceResult, to_legacy_emotion_segments

logger = get_logger(__name__)

type TranscriptFn = Callable[..., list[TranscriptWord]]
type TrainFn = Callable[[AppConfig], object]


def _default_transcript_fn(
    file_path: str,
    language: str,
    profile: ProfileName,
    settings: AppConfig,
    timings: dict[str, float] | None = None,
) -> list[TranscriptWord]:
    return extract_transcript(
        file_path, language=language, profile=profile, settings=settings, timings=timings
    )


@dataclass(frozen=True)
class RuntimePipeline:
    """Orchestrates training and inference workflows for the active profile."""

    settings: AppConfig
    backend_hooks: dict[str, BackendHook]
    transcript_fn: TranscriptFn = _default_transcript_fn
    train_fns: dict[ProfileName, TrainFn] = field(default_factory=dict)
    print_timeline_fn: Callable[[list[TimelineEntry]], None] = timeline_utils.print_timeline

    @property
    def active_profile(self) -> ProfileName:
        flags = self.settings.runtime_flags
        return resolve_profile_name(
            medium_profile=flags.medium_profile,
            accurate_profile=flags.accurate_profile,
            accurate_research_profile=flags.accurate_research_profile,
        )

    def run_training(self) -> None:
        """Runs training for the active profile."""
        profile = self.active_profile
        train_fn = self.train_fns.get(profile)
        if train_fn is None:
            raise NotImplementedError(f"Training for profile {profile!r} is not wired.")
        train_fn(self.settings)

    def run_inference(self, request: InferenceRequest) -> InferenceExecution:
        """Runs one inference workflow end to end.

        The runtime environment plan applies for the whole workflow scope
        and restores afterwards (reference ``pipeline.py:164-167`` +
        ``environment_plan.py:72-101``).
        """
        plan = build_runtime_environment_plan(self.settings)
        with temporary_process_env(plan):
            return self._run_inference_in_env(request)

    def _run_inference_in_env(self, request: InferenceRequest) -> InferenceExecution:
        timings: dict[str, float] = {}
        profile = self.active_profile
        # Validate the subtitle export request BEFORE any compute: a blank
        # path or un-derivable format is an input error, and surfacing it
        # after minutes of inference+transcription discards all results.
        subtitles_utils.resolve_subtitle_export_request(
            output_path=request.subtitle_output_path,
            subtitle_format=request.subtitle_format,
        )
        with phases.timed_phase(phases.PHASE_WORKFLOW_TOTAL, timings):
            with phases.timed_phase(phases.PHASE_EMOTION_SETUP, timings):
                capability = resolve_runtime_capability(
                    profile,
                    settings=self.settings,
                    available_hooks=frozenset(self.backend_hooks),
                )
                ensure_profile_supported(capability)
                hook = self.backend_hooks[capability.backend_id]

            with phases.timed_phase(phases.PHASE_EMOTION_INFERENCE, timings):
                detailed: InferenceResult = hook(request)
                emotions: list[EmotionSegment] = to_legacy_emotion_segments(detailed)

            transcript: list[TranscriptWord] = []
            if request.include_transcript:
                # The transcript fn records transcription_setup /
                # transcription_model_load into the same dict; the outer
                # phase covers the full lane (reference pipeline.py:194-251).
                with phases.timed_phase(phases.PHASE_TRANSCRIPTION, timings):
                    transcript = self.transcript_fn(
                        request.file_path,
                        request.language,
                        profile,
                        self.settings,
                        timings,
                    )

            with phases.timed_phase(phases.PHASE_TIMELINE_BUILD, timings):
                timeline = timeline_utils.build_timeline(transcript, emotions)

            timeline_csv_path: str | None = None
            subtitle_path: str | None = None
            with phases.timed_phase(phases.PHASE_TIMELINE_OUTPUT, timings):
                self.print_timeline_fn(timeline)
                if request.save_transcript:
                    timeline_csv_path = timeline_utils.save_timeline_to_csv(
                        timeline,
                        request.file_path,
                        timeline_config=self.settings.timeline,
                    )
                export = subtitles_utils.resolve_subtitle_export_request(
                    output_path=request.subtitle_output_path,
                    subtitle_format=request.subtitle_format,
                )
                if export is not None:
                    subtitle_format, output_path = export
                    subtitle_path = subtitles_utils.save_timeline_to_subtitles(
                        timeline,
                        request.file_path,
                        subtitle_format=subtitle_format,
                        output_path=output_path,
                        timeline_config=self.settings.timeline,
                    )

        return InferenceExecution(
            profile=profile,
            output_schema_version=detailed.schema_version,
            backend_id=capability.backend_id,
            emotions=emotions,
            transcript=transcript,
            timeline=timeline,
            used_backend_path=True,
            timeline_csv_path=timeline_csv_path,
            subtitle_path=subtitle_path,
            detailed_result=detailed,
            phase_timings_seconds=timings,
        )


def _default_train_fns() -> dict[ProfileName, TrainFn]:
    from ser_tpu._internal.models.fast_training import train_fast_model
    from ser_tpu._internal.models.training_entrypoints import (
        train_accurate_model,
        train_accurate_research_model,
        train_medium_model,
    )

    return {
        "fast": lambda settings: train_fast_model(settings=settings),
        "medium": lambda settings: train_medium_model(settings=settings),
        "accurate": lambda settings: train_accurate_model(settings=settings),
        "accurate-research": lambda settings: train_accurate_research_model(
            settings=settings
        ),
    }


def create_runtime_pipeline(settings: AppConfig) -> RuntimePipeline:
    """Wires the default pipeline for one settings snapshot."""
    return RuntimePipeline(
        settings=settings,
        backend_hooks=build_backend_hooks(settings),
        train_fns=_default_train_fns(),
    )


__all__ = ["RuntimePipeline", "create_runtime_pipeline"]
