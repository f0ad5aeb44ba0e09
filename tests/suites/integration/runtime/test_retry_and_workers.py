"""Retry policy + worker lifecycle against real primitives (SURVEY §4:
multi-process without a cluster — spawn real workers, not mocks)."""

import time

import pytest

from ser_tpu._internal.runtime.errors import (
    InferenceExecutionError,
    InferenceTimeoutError,
    TransientInferenceError,
)
from ser_tpu._internal.runtime.policy import RetryPolicy, run_with_retry_policy
from ser_tpu._internal.runtime.single_flight import SingleFlightRegistry
from ser_tpu._internal.runtime.worker_lifecycle import (
    run_attempt_in_process,
    run_attempt_in_spawned_process,
)


def test_retry_consumes_separate_budgets():
    calls = []

    def attempt():
        calls.append(1)
        if len(calls) == 1:
            raise InferenceTimeoutError("t")
        if len(calls) == 2:
            raise TransientInferenceError("x")
        return "ok"

    result = run_with_retry_policy(
        attempt,
        policy=RetryPolicy(max_timeout_retries=1, max_transient_retries=1),
        sleep=lambda s: None,
    )
    assert result == "ok"
    assert len(calls) == 3


def test_retry_exhausted_timeout_raises():
    def attempt():
        raise InferenceTimeoutError("t")

    with pytest.raises(InferenceTimeoutError):
        run_with_retry_policy(
            attempt, policy=RetryPolicy(max_timeout_retries=1), sleep=lambda s: None
        )


def test_transient_exhaustion_runs_fallback():
    def attempt():
        raise TransientInferenceError("x")

    result = run_with_retry_policy(
        attempt,
        policy=RetryPolicy(max_transient_retries=0),
        on_exhausted_transient=lambda: "cpu-fallback",
        sleep=lambda s: None,
    )
    assert result == "cpu-fallback"


def test_in_process_soft_timeout():
    with pytest.raises(InferenceTimeoutError):
        run_attempt_in_process(
            setup=lambda: None,
            compute=lambda _: time.sleep(5),
            timeout_seconds=0.2,
            profile="fast",
        )


def test_in_process_setup_not_timed():
    # Setup longer than the compute budget must not trip the timeout.
    result = run_attempt_in_process(
        setup=lambda: time.sleep(0.3) or 7,
        compute=lambda ctx: ctx * 2,
        timeout_seconds=0.2,
        profile="fast",
    )
    assert result == 14


def _slow_compute(_):
    time.sleep(30)


def _ok_setup():
    return 5


def _double(ctx):
    return ctx * 2


def _raising_setup():
    raise TransientInferenceError("device hiccup")


def test_spawned_worker_round_trip():
    result = run_attempt_in_spawned_process(
        setup=_ok_setup, compute=_double, timeout_seconds=30.0, profile="medium"
    )
    assert result == 10


def test_spawned_worker_compute_timeout_kills_worker():
    started = time.time()
    with pytest.raises(InferenceTimeoutError):
        run_attempt_in_spawned_process(
            setup=_ok_setup, compute=_slow_compute, timeout_seconds=1.0, profile="medium"
        )
    assert time.time() - started < 15


def test_spawned_worker_error_rehydrates_typed():
    with pytest.raises(TransientInferenceError, match="device hiccup"):
        run_attempt_in_spawned_process(
            setup=_raising_setup, compute=_double, timeout_seconds=5.0, profile="medium"
        )


def test_single_flight_serializes_and_prunes():
    import threading

    registry = SingleFlightRegistry()
    order = []

    def worker(tag):
        with registry.acquire("fast", "model"):
            order.append(f"{tag}-in")
            time.sleep(0.05)
            order.append(f"{tag}-out")

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(3)]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()
    # No interleaving: every -in is immediately followed by its own -out.
    for i in range(0, 6, 2):
        assert order[i].split("-")[0] == order[i + 1].split("-")[0]
    assert registry.active_keys() == []


def test_execution_error_is_not_retried():
    calls = []

    def attempt():
        calls.append(1)
        raise InferenceExecutionError("boom")

    with pytest.raises(InferenceExecutionError):
        run_with_retry_policy(
            attempt,
            policy=RetryPolicy(max_timeout_retries=5, max_transient_retries=5),
            sleep=lambda s: None,
        )
    assert len(calls) == 1
