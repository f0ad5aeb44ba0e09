"""Drop-in compatibility package: ``import ser`` → the TPU-native framework.

Reference users import ``ser.api`` / ``ser.config`` / ``ser.domain`` etc.
(reference ``ser/__init__.py:1-12``). This alias package lazily redirects any
``ser.X`` import to ``ser_tpu.X`` via a meta-path finder, so existing code and
scripts work unchanged against the TPU implementation.
"""

import importlib
import importlib.abc
import importlib.machinery
import sys

from ser_tpu import __version__  # noqa: F401
from ser_tpu.domain import (  # noqa: F401
    DatasetConsents,
    EmotionSegment,
    TimelineEntry,
    TranscriptWord,
)

__all__ = [
    "DatasetConsents",
    "EmotionSegment",
    "TimelineEntry",
    "TranscriptWord",
    "__version__",
]


class _SerAliasFinder(importlib.abc.MetaPathFinder, importlib.abc.Loader):
    """Resolves ``ser.<sub>`` to the already-packaged ``ser_tpu.<sub>`` module."""

    _PREFIX = "ser."

    def find_spec(self, fullname, path=None, target=None):
        if not fullname.startswith(self._PREFIX):
            return None
        target_name = "ser_tpu." + fullname[len(self._PREFIX) :]
        try:
            target_spec = importlib.util.find_spec(target_name)
        except (ImportError, ValueError):
            return None
        if target_spec is None:
            return None
        return importlib.machinery.ModuleSpec(fullname, self, origin=target_name)

    def create_module(self, spec):
        module = importlib.import_module(spec.origin)
        sys.modules[spec.name] = module
        return module

    def exec_module(self, module):
        pass

    def get_code(self, fullname):
        # ``python -m ser`` parity: runpy needs the target's code object to
        # execute ``ser.__main__`` as a script (reference ships a real
        # ``ser/__main__.py``; here it resolves to ``ser_tpu.__main__``).
        target_name = "ser_tpu." + fullname[len(self._PREFIX) :]
        target_spec = importlib.util.find_spec(target_name)
        if target_spec is None or target_spec.loader is None:
            raise ImportError(f"No code object for {fullname!r}")
        return target_spec.loader.get_code(target_name)


if not any(isinstance(finder, _SerAliasFinder) for finder in sys.meta_path):
    sys.meta_path.insert(0, _SerAliasFinder())


def __getattr__(name):
    try:
        return importlib.import_module(f"ser_tpu.{name}")
    except ImportError as err:
        raise AttributeError(f"module 'ser' has no attribute {name!r}") from err
