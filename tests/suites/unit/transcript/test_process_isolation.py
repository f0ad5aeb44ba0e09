"""Per-owner tests for ``_internal/transcript/process_isolation.py``.

Behavior spec: reference ``ser/_internal/transcription/process_isolation.py``
— isolation routing (config opt-in; honored only where a spawned worker can
own the device) and the worker handshake for the isolated path.
"""

from __future__ import annotations

import dataclasses

from ser_tpu._internal.config.bootstrap import reload_settings
from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.transcript.process_isolation import (
    run_isolated_transcription,
    should_use_process_isolated_path,
)


def _settings(*, isolation: bool) -> AppConfig:
    base = reload_settings()
    return dataclasses.replace(
        base,
        transcription=dataclasses.replace(
            base.transcription, process_isolation=isolation
        ),
    )


class TestRouting:
    def test_disabled_by_default(self):
        assert reload_settings().transcription.process_isolation is False

    def test_opt_out_never_isolates(self):
        assert (
            should_use_process_isolated_path(
                "jax_whisper", settings=_settings(isolation=False)
            )
            is False
        )

    def test_opt_in_honored_only_on_cpu(self):
        # Tests run CPU-forced, so the opt-in routes to the spawn path here;
        # on a TPU backend the same config must stay in-process (the chip is
        # owned by one process).
        import jax

        expected = jax.default_backend() == "cpu"
        assert (
            should_use_process_isolated_path(
                "jax_whisper", settings=_settings(isolation=True)
            )
            is expected
        )


def _setup():
    return "ready"


def _transcribe(context):
    # compute receives setup's result (the worker handshake contract).
    assert context == "ready"
    from ser_tpu.domain import TranscriptWord

    return [TranscriptWord(word="hello", start_seconds=0.0, end_seconds=0.4)]


class TestIsolatedRun:
    def test_words_cross_the_process_boundary_intact(self):
        words = run_isolated_transcription(
            setup=_setup,
            transcribe=_transcribe,
            timeout_seconds=60.0,
            backend_id="jax_whisper",
        )
        assert [word.word for word in words] == ["hello"]
        assert words[0].end_seconds == 0.4
