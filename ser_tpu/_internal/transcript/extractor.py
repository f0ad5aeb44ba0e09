"""Transcript extraction facade.

Parity surface: reference ``ser/_internal/transcript/transcript_extractor.py``
— ``extract_transcript(file, language, profile, settings)`` resolving a
``TranscriptionProfile`` (backend_id, model_name, use_demucs, use_vad) from the
profile catalog defaults + ``WHISPER_*`` env overrides, delegated to the
registered backend adapter. The in-process orchestration mirrors reference
``in_process_orchestration.py``: compatibility check → memory admission →
model load → transcribe, with ``transcription_setup`` /
``transcription_model_load`` phase timings recorded like reference
``pipeline.py:194-251``.
"""

from __future__ import annotations

from dataclasses import dataclass

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.runtime import phases
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.domain import TranscriptWord
from ser_tpu.profiles import ProfileName, get_profile_catalog

logger = get_logger(__name__)


class TranscriptionError(RuntimeError):
    """Raised when transcript extraction fails for operational reasons.

    Parity surface: reference ``transcript/transcript_extractor.py:34-35`` —
    every failure escaping the transcription lane is wrapped into this type,
    which the CLI classifies to exit code 3
    (reference ``runtime/commands.py:126-131``).
    """


class TranscriptionUnavailableError(TranscriptionError):
    """Raised when the transcription backend or its assets cannot be used."""


@dataclass(frozen=True)
class TranscriptionProfile:
    """Resolved transcription configuration for one runtime profile."""

    backend_id: str
    model_name: str
    use_demucs: bool
    use_vad: bool
    decode_strategy: str = "greedy"
    beam_size: int = 5
    length_penalty: float = 1.0


def resolve_transcription_profile(
    profile: ProfileName, settings: AppConfig
) -> TranscriptionProfile:
    """Catalog defaults layered with the active transcription settings."""
    defaults = get_profile_catalog()[profile].transcription_defaults
    return TranscriptionProfile(
        backend_id=settings.transcription.backend_id or defaults.backend_id,
        model_name=settings.models.whisper_model.name or defaults.model_name,
        use_demucs=settings.transcription.use_demucs,
        use_vad=settings.transcription.use_vad,
        decode_strategy=settings.transcription.decode_strategy,
        beam_size=settings.transcription.beam_size,
        length_penalty=settings.transcription.length_penalty,
    )


def _build_transcriber(resolved: TranscriptionProfile, settings: AppConfig):
    if resolved.backend_id != "jax_whisper":
        raise TranscriptionUnavailableError(
            f"Unknown transcription backend {resolved.backend_id!r}; "
            "the TPU framework ships the jax_whisper backend."
        )
    from ser_tpu._internal.transcript.jax_whisper_backend import JaxWhisperTranscriber

    return JaxWhisperTranscriber(
        model_name=resolved.model_name,
        cache_root=settings.models.whisper_download_root,
        use_vad=resolved.use_vad,
        use_demucs=resolved.use_demucs,
        decode_strategy=resolved.decode_strategy,
        beam_size=resolved.beam_size,
        length_penalty=resolved.length_penalty,
        separation_model_path=settings.transcription.separation_model_path,
    )


def _run_setup_gates(
    transcriber, resolved: TranscriptionProfile, settings: AppConfig
) -> None:
    """Compatibility + HBM admission gates (reference in-process orchestration:
    ``in_process_orchestration.py`` compat check then ``mps_admission.py:50-130``
    before model load)."""
    report = transcriber.check_compatibility()
    for issue in report.issues:
        if not issue.blocking:
            logger.warning("transcription %s issue: %s", issue.kind, issue.message)
    if report.blocking:
        blocking = "; ".join(i.message for i in report.issues if i.blocking)
        raise TranscriptionUnavailableError(
            f"Transcription backend {resolved.backend_id!r} blocked: {blocking}"
        )

    from ser_tpu._internal.transcript.hbm_admission import admit_transcription_model
    from ser_tpu._internal.transcript.profiling import default_calibration_report_path

    decision = admit_transcription_model(
        resolved.model_name,
        config=settings.transcription,
        default_report_path=default_calibration_report_path(settings.tmp_folder),
    )
    if not decision.admitted:
        raise TranscriptionUnavailableError(
            f"Transcription model {resolved.model_name!r} denied by device-memory "
            f"admission: {decision.reason}"
        )
    logger.debug("transcription admission: %s", decision.reason)


def _runtime_request(resolved: TranscriptionProfile, settings: AppConfig):
    from ser_tpu._internal.transcript.base import BackendRuntimeRequest

    return BackendRuntimeRequest(
        model_name=resolved.model_name,
        use_demucs=resolved.use_demucs,
        use_vad=resolved.use_vad,
    )


def _isolated_setup(resolved_fields: dict):
    """Spawned-worker SETUP: build + gate + load (inside the worker).

    The parent's RESOLVED transcription profile travels as plain fields —
    re-deriving it from the child's environment lost profile-projected flags
    (use_demucs/use_vad/model) and any programmatic settings, so the
    isolated run transcribed differently than the identical in-process run.
    Settings (paths, admission knobs) still re-derive from env in the child
    (spawn semantics). Running load here, not in compute, keeps the compute
    timeout budget for TRANSCRIBE only (worker_lifecycle's two-phase
    contract; model load/compile can take minutes).
    """
    from ser_tpu._internal.config.bootstrap import get_settings

    settings = get_settings()
    resolved = TranscriptionProfile(**resolved_fields)
    transcriber = _build_transcriber(resolved, settings)
    _run_setup_gates(transcriber, resolved, settings)
    transcriber.load_model(_runtime_request(resolved, settings))
    return transcriber


def _isolated_transcribe(file_path: str, language: str, transcriber) -> list[TranscriptWord]:
    return transcriber.transcribe(file_path, language=language)


def extract_transcript(
    file_path: str,
    *,
    language: str,
    profile: ProfileName,
    settings: AppConfig,
    timings: dict[str, float] | None = None,
) -> list[TranscriptWord]:
    """Extracts word-level transcript for one audio file.

    Raises ``TranscriptionUnavailableError`` when the backend's model assets
    are not present locally (this framework never downloads at inference
    time) or when device-memory admission denies the model. Setup and model
    load are timed into ``timings`` under the canonical phase names.
    """
    if timings is None:
        timings = {}
    import dataclasses as _dataclasses

    resolved = resolve_transcription_profile(profile, settings)
    from ser_tpu._internal.transcript.process_isolation import (
        should_use_process_isolated_path,
    )

    if should_use_process_isolated_path(resolved.backend_id, settings=settings):
        from functools import partial

        from ser_tpu._internal.transcript.process_isolation import (
            run_isolated_transcription,
        )

        # Worker-internal setup/load cannot be split into the canonical
        # setup/model-load phases from the parent; the pipeline's outer
        # PHASE_TRANSCRIPTION block times the whole isolated lane (recording
        # it all as "setup" here misattributed the numbers).
        try:
            return run_isolated_transcription(
                setup=partial(_isolated_setup, _dataclasses.asdict(resolved)),
                transcribe=partial(_isolated_transcribe, file_path, language),
                timeout_seconds=settings.transcription.isolation_timeout_seconds,
                backend_id=resolved.backend_id,
            )
        except TranscriptionError:
            raise
        except Exception as err:
            logger.error("Error processing speech extraction: %s", err, exc_info=True)
            raise TranscriptionError("Failed to transcribe audio.") from err

    with phases.timed_phase(phases.PHASE_TRANSCRIPTION_SETUP, timings):
        transcriber = _build_transcriber(resolved, settings)
        _run_setup_gates(transcriber, resolved, settings)

    with phases.timed_phase(phases.PHASE_TRANSCRIPTION_MODEL_LOAD, timings):
        if transcriber.setup_required():
            transcriber.load_model(_runtime_request(resolved, settings))

    # Unexpected backend failures surface as TranscriptionError (reference
    # extractor_entrypoints.py:141-152: passthrough the taxonomy, wrap the
    # rest with a stable message).
    try:
        return transcriber.transcribe(file_path, language=language)
    except TranscriptionError:
        raise
    except Exception as err:
        logger.error("Error processing speech extraction: %s", err, exc_info=True)
        raise TranscriptionError("Failed to transcribe audio.") from err


__all__ = [
    "TranscriptionError",
    "TranscriptionProfile",
    "TranscriptionUnavailableError",
    "extract_transcript",
    "resolve_transcription_profile",
]
