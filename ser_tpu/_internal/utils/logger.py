"""Structured logging with policy-scoped dependency-warning suppression.

Parity surface: reference ``ser/_internal/utils/logger.py`` — ``get_logger``
per module, ``configure_logging(level)`` honoring CLI/env, and scoped warning
policies that silence known-noisy third-party warnings without hiding ours.
"""

from __future__ import annotations

import logging
import os
import warnings
from collections.abc import Iterator
from contextlib import contextmanager
from dataclasses import dataclass

_ROOT_NAME = "ser_tpu"
_configured = False


def get_logger(name: str) -> logging.Logger:
    """Returns a namespaced logger under the framework root."""
    if not name.startswith(_ROOT_NAME):
        name = f"{_ROOT_NAME}.{name}"
    return logging.getLogger(name)


def configure_logging(level: str | int | None = None) -> None:
    """Configures the framework root logger once; later calls adjust the level."""
    global _configured
    resolved = level if level is not None else os.environ.get("LOG_LEVEL", "INFO")
    if isinstance(resolved, str):
        resolved = getattr(logging, resolved.upper(), logging.INFO)
    root = logging.getLogger(_ROOT_NAME)
    if not _configured:
        handler = logging.StreamHandler()
        handler.setFormatter(
            logging.Formatter("%(asctime)s %(levelname)s %(name)s: %(message)s")
        )
        root.addHandler(handler)
        root.propagate = False
        _configured = True
    root.setLevel(resolved)


@dataclass(frozen=True)
class WarningPolicy:
    """One suppressed warning pattern scoped to a module regex."""

    message_regex: str
    category: type[Warning]
    module_regex: str


#: Known-noisy warnings from numeric dependencies that carry no user action.
DEPENDENCY_WARNING_POLICIES: tuple[WarningPolicy, ...] = (
    WarningPolicy(r"os\.fork\(\) was called", RuntimeWarning, r".*"),
    WarningPolicy(r".*TPU.*experimental.*", UserWarning, r"jax.*"),
)


@contextmanager
def suppressed_dependency_warnings(
    policies: tuple[WarningPolicy, ...] = DEPENDENCY_WARNING_POLICIES,
) -> Iterator[None]:
    """Scoped filter application for known non-actionable dependency warnings."""
    with warnings.catch_warnings():
        for policy in policies:
            warnings.filterwarnings(
                "ignore",
                message=policy.message_regex,
                category=policy.category,
                module=policy.module_regex,
            )
        yield


__all__ = [
    "DEPENDENCY_WARNING_POLICIES",
    "WarningPolicy",
    "configure_logging",
    "get_logger",
    "suppressed_dependency_warnings",
]
