"""Public utils facade (reference ``ser/utils/__init__.py:27-84`` parity).

Lazily re-exports the supported helper surface: audio IO, timeline build/
render/persist, logging, and elapsed-time display.
"""

from __future__ import annotations

from typing import Any

__all__ = [
    "build_timeline",
    "display_elapsed_time",
    "get_logger",
    "print_timeline",
    "read_audio_file",
    "save_timeline_to_csv",
]

_LAZY = {
    "read_audio_file": ("ser_tpu._internal.utils.audio_io", "read_audio_file"),
    "build_timeline": ("ser_tpu._internal.utils.timeline", "build_timeline"),
    "print_timeline": ("ser_tpu._internal.utils.timeline", "print_timeline"),
    "save_timeline_to_csv": ("ser_tpu._internal.utils.timeline", "save_timeline_to_csv"),
    "get_logger": ("ser_tpu._internal.utils.logger", "get_logger"),
    "display_elapsed_time": ("ser_tpu._internal.utils.common", "display_elapsed_time"),
}


def __getattr__(name: str) -> Any:
    try:
        module_name, attr = _LAZY[name]
    except KeyError as err:
        raise AttributeError(f"module 'ser_tpu.utils' has no attribute {name!r}") from err
    import importlib

    return getattr(importlib.import_module(module_name), attr)
