"""Transcription process-isolation routing.

Parity surface: reference ``ser/_internal/transcription/process_isolation.py``
— isolation was mandatory exactly for the ctranslate2 (faster_whisper) backend
because of an OpenMP runtime clash on macOS-x86_64 (reference
``utils/transcription_compat.py:85-105``). The JAX backend has no such clash
and, on TPU, CANNOT be isolated (the device is owned by one process), so
isolation defaults off; the spawn path remains available for CPU-only
backends via the same worker machinery the emotion boundaries use.
"""

from __future__ import annotations

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.runtime.worker_lifecycle import run_attempt_in_spawned_process
from ser_tpu.domain import TranscriptWord


def should_use_process_isolated_path(backend_id: str, *, settings: AppConfig) -> bool:
    """True when transcription should run in a spawned worker.

    No bundled backend *requires* isolation (the reference's mandatory case
    was ctranslate2's OpenMP clash; the JAX backend has none), so isolation
    is a config opt-in — and it is honored only on CPU: a TPU is owned by
    exactly one process, so a spawned worker could never initialize it.
    """
    if not settings.transcription.process_isolation:
        return False
    import jax

    return jax.default_backend() == "cpu"


def run_isolated_transcription(
    *,
    setup,
    transcribe,
    timeout_seconds: float,
    backend_id: str,
) -> list[TranscriptWord]:
    """Runs setup/load/transcribe inside a spawned worker (reference
    ``process_isolation.py:478-505`` handshake semantics)."""
    return run_attempt_in_spawned_process(
        setup=setup,
        compute=transcribe,
        timeout_seconds=timeout_seconds,
        profile=f"transcription:{backend_id}",
    )


__all__ = ["run_isolated_transcription", "should_use_process_isolated_path"]
