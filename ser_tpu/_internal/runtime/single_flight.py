"""Ref-counted keyed locks serializing same-model concurrent work.

Parity surface: reference ``ser/_internal/runtime/single_flight.py:21-66`` —
one lock per (profile, model_id) key, pruned when the last holder releases so
the registry never grows unboundedly.
"""

from __future__ import annotations

import threading
from collections.abc import Iterator
from contextlib import contextmanager


class SingleFlightRegistry:
    """Keyed re-entrant-safe lock registry with reference counting."""

    def __init__(self) -> None:
        self._guard = threading.Lock()
        self._locks: dict[tuple[str, ...], tuple[threading.Lock, int]] = {}

    @contextmanager
    def acquire(self, *key_parts: str) -> Iterator[None]:
        """Holds the keyed lock for the scope; serializes same-key callers."""
        key = tuple(key_parts)
        with self._guard:
            lock, count = self._locks.get(key, (threading.RLock(), 0))
            self._locks[key] = (lock, count + 1)
        try:
            # Inside try: an interrupt while BLOCKED here must still
            # decrement, or the key leaks forever. RLock keeps same-thread
            # nested acquires (the documented re-entrant contract) deadlock
            # free.
            lock.acquire()
            try:
                yield
            finally:
                lock.release()
        finally:
            with self._guard:
                lock, count = self._locks[key]
                if count <= 1:
                    del self._locks[key]
                else:
                    self._locks[key] = (lock, count - 1)

    def active_keys(self) -> list[tuple[str, ...]]:
        """Keys currently held or queued (for diagnostics/tests)."""
        with self._guard:
            return list(self._locks)


#: Process-wide registry used by profile boundaries.
GLOBAL_SINGLE_FLIGHT = SingleFlightRegistry()

__all__ = ["GLOBAL_SINGLE_FLIGHT", "SingleFlightRegistry"]
