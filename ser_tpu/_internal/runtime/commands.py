"""Command runners with exception→exit-code classification.

Parity surface: reference ``ser/_internal/runtime/commands.py:43-134`` — exit
code 2 for validation errors, 3 for timeouts, 1 for other runtime failures,
0 on success.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import TypeVar

from ser_tpu._internal.runtime.errors import (
    InferenceTimeoutError,
    ModelUnavailableError,
)
from ser_tpu._internal.runtime.registry import UnsupportedProfileError
from ser_tpu._internal.runtime.restricted_backends import RestrictedBackendError
from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

EXIT_OK = 0
EXIT_RUNTIME = 1
EXIT_VALIDATION = 2
EXIT_TIMEOUT = 3

T = TypeVar("T")

_VALIDATION_ERRORS = (
    ValueError,
    FileNotFoundError,
    UnsupportedProfileError,
    RestrictedBackendError,
    ModelUnavailableError,  # user-actionable precondition: train first
)


def classify_exit_code(error: BaseException) -> int:
    """Maps one failure to its stable CLI exit code."""
    if isinstance(error, InferenceTimeoutError):
        return EXIT_TIMEOUT
    if isinstance(error, _VALIDATION_ERRORS):
        return EXIT_VALIDATION
    return EXIT_RUNTIME


def run_command(operation: Callable[[], T], *, label: str) -> tuple[T | None, int]:
    """Runs one workflow; returns (result, exit_code) with errors logged."""
    try:
        return operation(), EXIT_OK
    except KeyboardInterrupt:
        logger.warning("%s interrupted.", label)
        return None, EXIT_RUNTIME
    except BaseException as err:  # noqa: BLE001 - the CLI boundary reports everything
        code = classify_exit_code(err)
        logger.error("%s failed (%s): %s", label, type(err).__name__, err)
        return None, code


__all__ = [
    "EXIT_OK",
    "EXIT_RUNTIME",
    "EXIT_TIMEOUT",
    "EXIT_VALIDATION",
    "classify_exit_code",
    "run_command",
]
