"""Transcript extraction facade.

Parity surface: reference ``ser/_internal/transcript/transcript_extractor.py``
— ``extract_transcript(file, language, profile, settings)`` resolving a
``TranscriptionProfile`` (backend_id, model_name, use_demucs, use_vad) from the
profile catalog defaults + ``WHISPER_*`` env overrides, delegated to the
registered backend adapter.
"""

from __future__ import annotations

from dataclasses import dataclass

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.domain import TranscriptWord
from ser_tpu.profiles import ProfileName, get_profile_catalog

logger = get_logger(__name__)


class TranscriptionUnavailableError(RuntimeError):
    """Raised when the transcription backend or its assets cannot be used."""


@dataclass(frozen=True)
class TranscriptionProfile:
    """Resolved transcription configuration for one runtime profile."""

    backend_id: str
    model_name: str
    use_demucs: bool
    use_vad: bool


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
    )


def extract_transcript(
    file_path: str,
    *,
    language: str,
    profile: ProfileName,
    settings: AppConfig,
) -> list[TranscriptWord]:
    """Extracts word-level transcript for one audio file.

    Raises ``TranscriptionUnavailableError`` when the backend's model assets
    are not present locally (this framework never downloads at inference
    time).
    """
    resolved = resolve_transcription_profile(profile, settings)
    if resolved.backend_id != "jax_whisper":
        raise TranscriptionUnavailableError(
            f"Unknown transcription backend {resolved.backend_id!r}; "
            "the TPU framework ships the jax_whisper backend."
        )
    from ser_tpu._internal.transcript.jax_whisper_backend import JaxWhisperTranscriber

    transcriber = JaxWhisperTranscriber(
        model_name=resolved.model_name,
        cache_root=settings.models.whisper_download_root,
        use_vad=resolved.use_vad,
        use_demucs=resolved.use_demucs,
    )
    return transcriber.transcribe(file_path, language=language)


__all__ = [
    "TranscriptionProfile",
    "TranscriptionUnavailableError",
    "extract_transcript",
    "resolve_transcription_profile",
]
