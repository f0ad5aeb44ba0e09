"""Attempt execution with compute-only timeouts: in-process and spawned modes.

Parity surface: reference ``worker_lifecycle.py`` / ``process_timeout.py`` —
the two-phase handshake (setup → compute) so the timeout budget covers only
compute, typed error rehydration across the boundary, and terminate→kill
escalation.

TPU design note (SURVEY.md §2.10): the accelerator is owned by ONE process, so
process isolation is NOT the default on TPU profiles (a spawned worker could
not reach the device). The in-process soft-timeout path keeps the reference's
compute-only timeout semantics around the jitted call — models are loaded and
compiled in the setup phase, then only execution is timed. The spawn path
remains available for CPU-only backends and is what process_isolation=true
selects.
"""

from __future__ import annotations

import multiprocessing as mp
import pickle
from collections.abc import Callable
from concurrent.futures import ThreadPoolExecutor
from concurrent.futures import TimeoutError as FutureTimeoutError
from typing import Any

from ser_tpu._internal.runtime.errors import (
    InferenceError,
    InferenceExecutionError,
    InferenceTimeoutError,
    error_kind,
    rehydrate_error,
)
from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

_SETUP_COMPLETE = ("phase", "setup_complete")
_KILL_GRACE_SECONDS = 2.0


def run_attempt_in_process(
    *,
    setup: Callable[[], Any],
    compute: Callable[[Any], Any],
    timeout_seconds: float,
    profile: str,
) -> Any:
    """Runs setup untimed, then compute under a soft thread timeout.

    A timed-out thread cannot be killed (and a jitted TPU program cannot be
    interrupted mid-flight), so on timeout the attempt is abandoned and a
    typed timeout error raised — matching the reference's thread-pool soft
    timeout (worker_lifecycle.py:98-118).
    """
    context = setup()
    if timeout_seconds <= 0:
        return compute(context)
    # NOT a `with` block: ThreadPoolExecutor.__exit__ is shutdown(wait=True),
    # which would join the still-running compute thread and block the caller
    # for however long the hang lasts — the timeout would bound nothing.
    pool = ThreadPoolExecutor(max_workers=1)
    future = pool.submit(compute, context)
    try:
        result = future.result(timeout=timeout_seconds)
    except FutureTimeoutError:
        future.cancel()
        pool.shutdown(wait=False)  # abandon the thread; it dies with the run
        raise InferenceTimeoutError(
            f"Inference compute exceeded {timeout_seconds:.1f}s budget.",
            profile=profile,
        ) from None
    pool.shutdown(wait=True)
    return result


def _worker_main(conn, setup_compute_payload: bytes) -> None:
    """Spawned worker: run setup, signal, run compute, ship result or error."""
    try:
        setup, compute = pickle.loads(setup_compute_payload)
        context = setup()
        conn.send(_SETUP_COMPLETE)
        result = compute(context)
        conn.send(("ok", result))
    except BaseException as err:  # noqa: BLE001 - everything must cross the pipe typed
        try:
            conn.send(("err", error_kind(err), f"{type(err).__name__}: {err}"))
        except Exception:  # pragma: no cover - pipe already broken
            pass
    finally:
        conn.close()


def run_attempt_in_spawned_process(
    *,
    setup: Callable[[], Any],
    compute: Callable[[Any], Any],
    timeout_seconds: float,
    setup_timeout_seconds: float = 300.0,
    profile: str,
) -> Any:
    """Runs one attempt in a spawned worker with a duplex-pipe handshake.

    Protocol (reference worker_lifecycle.py:34-95): worker sends
    ``("phase", "setup_complete")`` then ``("ok", result)`` or
    ``("err", kind, message)``. The compute timeout starts only after setup
    completes. On timeout the worker is terminated, then killed.
    """
    ctx = mp.get_context("spawn")
    parent_conn, child_conn = ctx.Pipe(duplex=False)
    payload = pickle.dumps((setup, compute))
    process = ctx.Process(target=_worker_main, args=(child_conn, payload), daemon=True)
    process.start()
    child_conn.close()
    try:
        if not parent_conn.poll(setup_timeout_seconds):
            raise InferenceTimeoutError(
                f"Worker setup exceeded {setup_timeout_seconds:.1f}s.", profile=profile
            )
        message = parent_conn.recv()
        if message != _SETUP_COMPLETE:
            raise _parse_error(message, profile)
        compute_window = timeout_seconds if timeout_seconds > 0 else None
        if not parent_conn.poll(compute_window):
            raise InferenceTimeoutError(
                f"Inference compute exceeded {timeout_seconds:.1f}s budget.", profile=profile
            )
        message = parent_conn.recv()
        if isinstance(message, tuple) and len(message) == 2 and message[0] == "ok":
            return message[1]
        raise _parse_error(message, profile)
    except (EOFError, ConnectionError) as err:
        raise InferenceExecutionError(
            f"Worker pipe closed unexpectedly: {err}", profile=profile
        ) from err
    finally:
        parent_conn.close()
        _shutdown_worker(process)


def _parse_error(message: Any, profile: str) -> InferenceError:
    """Validates + rehydrates one worker error message."""
    if (
        isinstance(message, tuple)
        and len(message) == 3
        and message[0] == "err"
        and isinstance(message[1], str)
        and isinstance(message[2], str)
    ):
        return rehydrate_error(message[1], message[2], profile=profile)
    return InferenceExecutionError(
        f"Malformed worker message: {message!r}", profile=profile
    )


def _shutdown_worker(process: mp.process.BaseProcess) -> None:
    """terminate → kill escalation (reference worker_lifecycle.py:136-147)."""
    if not process.is_alive():
        process.join(timeout=0.1)
        return
    process.terminate()
    process.join(timeout=_KILL_GRACE_SECONDS)
    if process.is_alive():
        logger.warning("Worker did not terminate; killing.")
        process.kill()
        process.join(timeout=_KILL_GRACE_SECONDS)


__all__ = [
    "run_attempt_in_process",
    "run_attempt_in_spawned_process",
]
