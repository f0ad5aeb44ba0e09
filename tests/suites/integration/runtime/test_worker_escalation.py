"""Real stuck-child worker: timeout → terminate → kill escalation."""

import os
import signal
import tempfile
import time
from pathlib import Path

import pytest

from ser_tpu._internal.runtime.errors import InferenceTimeoutError
from ser_tpu._internal.runtime.worker_lifecycle import run_attempt_in_spawned_process

_PID_FILE = Path(tempfile.gettempdir()) / "ser_tpu_stuck_worker.pid"


def _stubborn_setup():
    """Child setup: record pid and refuse SIGTERM so only SIGKILL works."""
    signal.signal(signal.SIGTERM, signal.SIG_IGN)
    _PID_FILE.write_text(str(os.getpid()), encoding="utf-8")
    return None


def _hang_forever(_setup_result):
    time.sleep(600)
    return "unreachable"


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def test_stuck_child_is_killed_after_terminate_is_ignored():
    _PID_FILE.unlink(missing_ok=True)
    started = time.monotonic()
    with pytest.raises(InferenceTimeoutError, match="compute exceeded"):
        run_attempt_in_spawned_process(
            setup=_stubborn_setup,
            compute=_hang_forever,
            timeout_seconds=1.0,
            profile="escalation-test",
        )
    elapsed = time.monotonic() - started
    # Bounded: timeout + terminate grace + kill grace, not the 600 s sleep.
    assert elapsed < 30.0

    pid = int(_PID_FILE.read_text())
    deadline = time.monotonic() + 10.0
    while _pid_alive(pid) and time.monotonic() < deadline:
        time.sleep(0.1)
    assert not _pid_alive(pid), "SIGTERM-immune child must be SIGKILLed"


def _failing_setup():
    raise OSError("setup exploded")


def _noop_compute(_setup_result):
    return "ok"


def test_setup_failure_is_rehydrated_not_hung():
    from ser_tpu._internal.runtime.errors import InferenceError

    with pytest.raises(InferenceError, match="setup exploded"):
        run_attempt_in_spawned_process(
            setup=_failing_setup,
            compute=_noop_compute,
            timeout_seconds=5.0,
            profile="escalation-test",
        )
