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

#: Backends whose host runtimes require a separate process.
_ISOLATION_REQUIRED_BACKENDS: frozenset[str] = frozenset({"faster_whisper"})


def should_use_process_isolated_path(backend_id: str, *, settings: AppConfig) -> bool:
    """True when the transcription backend must run in a spawned worker."""
    import jax

    if backend_id in _ISOLATION_REQUIRED_BACKENDS:
        return True
    if jax.default_backend() != "cpu":
        return False  # accelerator is single-process; never isolate
    return False


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
