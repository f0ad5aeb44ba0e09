"""Ambient settings bootstrap: ContextVar-scoped snapshot access.

Parity surface: reference ``ser/_internal/config/bootstrap.py:258-291`` —
``get_settings`` returns the active snapshot (building one on first use),
``reload_settings`` re-captures the environment, and ``settings_override`` is a
re-entrant ContextVar scope so concurrent workflows never observe each other's
overrides. The snapshot is immutable; this is the whole concurrency-safety
story for configuration (SURVEY §5 race-detection notes).
"""

from __future__ import annotations

from collections.abc import Iterator
from contextlib import contextmanager
from contextvars import ContextVar
from threading import Lock

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs

_ambient_settings: AppConfig | None = None
_ambient_lock = Lock()
_scoped_settings: ContextVar[AppConfig | None] = ContextVar("ser_tpu_settings", default=None)


def build_settings() -> AppConfig:
    """Captures the environment and builds one fresh settings snapshot."""
    return build_settings_from_inputs(capture_settings_inputs())


def get_settings() -> AppConfig:
    """Returns the active settings snapshot (scoped override > ambient)."""
    scoped = _scoped_settings.get()
    if scoped is not None:
        return scoped
    global _ambient_settings
    if _ambient_settings is None:
        with _ambient_lock:
            if _ambient_settings is None:
                _ambient_settings = build_settings()
    return _ambient_settings


def reload_settings() -> AppConfig:
    """Rebuilds the ambient snapshot from the current environment and returns it."""
    global _ambient_settings
    with _ambient_lock:
        _ambient_settings = build_settings()
        return _ambient_settings


@contextmanager
def settings_override(settings: AppConfig) -> Iterator[AppConfig]:
    """Scopes one explicit settings snapshot to the current context."""
    token = _scoped_settings.set(settings)
    try:
        yield settings
    finally:
        _scoped_settings.reset(token)


__all__ = ["build_settings", "get_settings", "reload_settings", "settings_override"]
