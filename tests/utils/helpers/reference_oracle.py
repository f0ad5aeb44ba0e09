"""Client for the reference-oracle subprocess (differential parity tests).

Spawns one persistent ``python -I`` worker whose ``sys.path`` points at
``/root/reference`` (see ``reference_oracle_worker.py``), so the reference's
real pure-Python stages execute in full isolation from this repo's drop-in
``ser`` alias package. One worker serves a whole test session; each call is a
length-prefixed pickle round trip.
"""

from __future__ import annotations

import pickle
import struct
import subprocess
import sys
import tempfile
from pathlib import Path

REFERENCE_ROOT = Path("/root/reference")
_WORKER_PATH = Path(__file__).with_name("reference_oracle_worker.py")


def reference_available() -> bool:
    """True when the reference checkout is present on this machine."""
    return (REFERENCE_ROOT / "ser" / "api.py").is_file()


class OracleRemoteError(RuntimeError):
    """An exception raised inside the reference while serving a request."""

    def __init__(self, error_type: str, message: str):
        super().__init__(f"{error_type}: {message}")
        self.error_type = error_type
        self.message = message


class ReferenceOracle:
    """Persistent subprocess executing reference stages on request."""

    def __init__(self) -> None:
        # -I: isolated mode — ignores PYTHONPATH and keeps the repo root (and
        # its `ser` alias package) off the worker's sys.path entirely.
        # stderr goes to a FILE, not a pipe: nobody drains it during calls,
        # and a chatty reference stage (sklearn metric warnings, per-call
        # logging) filling a 64 KiB pipe buffer deadlocks the protocol — the
        # worker blocks on the stderr write while the client blocks reading
        # the stdout response.
        self._stderr_file = tempfile.TemporaryFile()
        self._process = subprocess.Popen(
            [sys.executable, "-I", str(_WORKER_PATH)],
            stdin=subprocess.PIPE,
            stdout=subprocess.PIPE,
            stderr=self._stderr_file,
        )

    def _stderr_tail(self) -> str:
        try:
            self._stderr_file.seek(0)
            return self._stderr_file.read().decode(errors="replace")[-4000:]
        except Exception:  # noqa: BLE001 - diagnostics only
            return "<stderr unavailable>"

    def call(self, op: str, **payload):
        """Runs one reference stage; raises OracleRemoteError on remote raise."""
        process = self._process
        if process.poll() is not None:
            raise RuntimeError(f"reference oracle worker died:\n{self._stderr_tail()}")
        blob = pickle.dumps({"op": op, **payload}, protocol=pickle.HIGHEST_PROTOCOL)
        process.stdin.write(struct.pack(">Q", len(blob)))
        process.stdin.write(blob)
        process.stdin.flush()
        header = process.stdout.read(8)
        if len(header) < 8:
            raise RuntimeError(
                f"reference oracle worker closed the pipe:\n{self._stderr_tail()}"
            )
        (length,) = struct.unpack(">Q", header)
        response = pickle.loads(process.stdout.read(length))
        if "error" in response:
            raise OracleRemoteError(response["error"], response["message"])
        return response["ok"]

    def close(self) -> None:
        if self._process.poll() is None:
            self._process.stdin.close()
            self._process.wait(timeout=10)
        self._stderr_file.close()


__all__ = ["OracleRemoteError", "ReferenceOracle", "reference_available"]
