"""Exit-code classification + phase-timing contract tests."""

import pytest

from ser_tpu._internal.runtime import phases
from ser_tpu._internal.runtime.commands import (
    EXIT_OK,
    EXIT_RUNTIME,
    EXIT_TRANSCRIPTION,
    EXIT_VALIDATION,
    classify_exit_code,
    run_command,
)
from ser_tpu._internal.runtime.errors import (
    InferenceExecutionError,
    InferenceTimeoutError,
    ModelLoadError,
    ModelUnavailableError,
    RuntimeDependencyError,
)
from ser_tpu._internal.runtime.registry import UnsupportedProfileError
from ser_tpu._internal.runtime.restricted_backends import RestrictedBackendError
from ser_tpu._internal.transcript.extractor import (
    TranscriptionError,
    TranscriptionUnavailableError,
)


@pytest.mark.parametrize(
    "error,expected",
    [
        # Reference commands.py:91-110 — timeouts are user-actionable (2).
        (InferenceTimeoutError("t"), EXIT_VALIDATION),
        (ValueError("v"), EXIT_VALIDATION),
        (FileNotFoundError("f"), EXIT_VALIDATION),
        (UnsupportedProfileError("u"), EXIT_VALIDATION),
        (RestrictedBackendError("r"), EXIT_VALIDATION),
        (ModelUnavailableError("m"), EXIT_VALIDATION),
        (ModelLoadError("l"), EXIT_VALIDATION),
        (RuntimeDependencyError("d"), EXIT_VALIDATION),
        (InferenceExecutionError("e"), EXIT_RUNTIME),
        (RuntimeError("x"), EXIT_RUNTIME),
        # Reference commands.py:126-131 — transcription failures exit 3.
        (TranscriptionError("tx"), EXIT_TRANSCRIPTION),
        (TranscriptionUnavailableError("tu"), EXIT_TRANSCRIPTION),
    ],
)
def test_exit_code_classification(error, expected):
    assert classify_exit_code(error) == expected


def test_run_command_success_and_failure():
    result, code = run_command(lambda: 42, label="op")
    assert (result, code) == (42, EXIT_OK)

    def boom():
        raise TranscriptionError("failed")

    result, code = run_command(boom, label="op")
    assert result is None and code == EXIT_TRANSCRIPTION


def test_phase_names_are_reference_canonical():
    assert phases.ALL_PHASES == (
        "workflow_total",
        "emotion_setup",
        "emotion_inference",
        "transcription_setup",
        "transcription_model_load",
        "transcription",
        "timeline_build",
        "timeline_output",
    )


def test_timed_phase_records_on_success_and_failure():
    timings: dict[str, float] = {}
    with phases.timed_phase("workflow_total", timings):
        pass
    assert timings["workflow_total"] >= 0.0
    with pytest.raises(RuntimeError):
        with phases.timed_phase("emotion_inference", timings):
            raise RuntimeError("boom")
    assert "emotion_inference" in timings


def test_oom_parsing_handles_canonical_xla_shapes():
    """The size regex must parse the real XLA/TPU message formats."""
    from ser_tpu._internal.runtime.oom import is_device_oom, parse_device_oom

    allocate = "RESOURCE_EXHAUSTED: Out of memory while trying to allocate 8589934592 bytes."
    assert is_device_oom(allocate)
    assert parse_device_oom(allocate).requested_bytes == 8589934592

    hbm = "Used 16.6G of 15.48G hbm. Exceeded hbm capacity."
    assert is_device_oom(hbm)
    assert parse_device_oom(hbm).limit_bytes == int(15.48 * (1 << 30))

    free = "RESOURCE_EXHAUSTED: There are 0.52G free."
    assert parse_device_oom(free).available_bytes == int(0.52 * (1 << 30))

    # Word-bounded detection: unrelated errors are not transient OOMs.
    assert not is_device_oom("cannot open ROOM_101.wav")


def test_timed_phase_accumulates_on_reentry():
    """Re-entering a phase adds to its total (per-chunk setups must not
    overwrite each other)."""
    import time as _time

    from ser_tpu._internal.runtime import phases

    timings: dict[str, float] = {}
    for _ in range(3):
        with phases.timed_phase("transcription_setup", timings):
            _time.sleep(0.01)
    assert timings["transcription_setup"] >= 0.03


def test_phase_labels_match_reference_contract():
    # Reference phase_contract.py:17-26 — the human-readable label set.
    from ser_tpu._internal.runtime.phases import ALL_PHASES, PHASE_LABELS, phase_label

    assert set(PHASE_LABELS) == set(ALL_PHASES)
    assert phase_label("workflow_total") == "SER workflow"
    assert phase_label("transcription_model_load") == "Transcription model load"
    assert phase_label("not_a_phase") == "not_a_phase"
