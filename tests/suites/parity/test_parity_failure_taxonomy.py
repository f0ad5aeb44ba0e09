"""Differential parity: the training failure-classification ladder.

Reference stage: ``ser/_internal/models/training_readiness.py:704-791`` —
exception type + scope → (scope, reason_code, disposition, severity). The
dispositions gate what training may do after a failure (quarantine vs abort
vs retry); any mapping drift silently changes which defects stop a run.
The repo's exceptions are mapped onto the reference's by role
(``audio_io.AudioDecodeError`` ↔ ``audio_utils.AudioDecodeError`` etc.).
"""

from __future__ import annotations

from pathlib import Path

import pytest

from ser_tpu._internal.models import training_readiness as tr
from ser_tpu._internal.utils.audio_io import AudioDecodeError, AudioIntegrityError


def _ours(kind, *, scope, message="boom", errno=None, filename=None, sample_path=None, roots=()):
    if kind == "audio_integrity":
        error = AudioIntegrityError(message)
    elif kind == "audio_decode":
        error = AudioDecodeError(message)
    elif kind == "file_not_found":
        error = FileNotFoundError(2, message, filename)
    elif kind == "os_errno":
        error = OSError(errno, message)
    elif kind == "timeout":
        error = TimeoutError(message)
    elif kind == "window":
        error = tr.WindowContainmentError(message)
    elif kind == "cache":
        error = tr.CacheEntryCorruptError(message)
    elif kind == "optional_artifact":
        error = tr.OptionalArtifactError(message)
    else:
        error = RuntimeError(message)
    c = tr.classify_failure(
        error,
        scope=tr.FailureScope(scope),
        sample_path=sample_path,
        allowed_roots=tuple(Path(r) for r in roots),
    )
    return {
        "scope": c.scope.value,
        "reason_code": c.reason_code.value,
        "disposition": c.disposition.value,
    }


def _theirs(oracle, kind, *, scope, message="boom", errno=None, filename=None,
            sample_path=None, roots=()):
    payload = {
        "error": kind,
        "scope": scope,
        "message": message,
        "allowed_roots": [str(r) for r in roots],
    }
    if errno is not None:
        payload["errno"] = errno
    if filename is not None:
        payload["filename"] = filename
    if sample_path is not None:
        payload["sample_path"] = str(sample_path)
    result = oracle.call("classify_failure", **payload)
    return {k: result[k] for k in ("scope", "reason_code", "disposition")}


CASES = [
    # (kind, scope, extra kwargs)
    ("audio_integrity", "sample", {"message": "unmaterialized Git LFS pointer: x.wav"}),
    ("audio_integrity", "corpus", {"message": "Git LFS pointer found"}),
    ("audio_integrity", "sample", {"message": "metadata instead of audio"}),  # non-LFS
    ("audio_decode", "sample", {}),
    ("audio_decode", "cache", {}),  # wrong scope -> abort on both sides
    ("window", "window", {}),
    ("window", "sample", {}),
    ("cache", "cache", {}),
    ("cache", "window", {}),
    ("optional_artifact", "optional_artifact", {}),
    ("timeout", "sample", {}),
    ("timeout", "run", {}),
    ("os_errno", "sample", {"errno": 11}),  # EAGAIN -> bounded retry
    ("os_errno", "sample", {"errno": 16}),  # EBUSY
    ("os_errno", "sample", {"errno": 2}),  # ENOENT plain OSError -> abort
    ("unknown", "sample", {}),
    ("unknown", "run", {}),
]


@pytest.mark.parametrize("kind,scope,extra", CASES)
def test_classification_matches_reference(oracle, kind, scope, extra):
    assert _ours(kind, scope=scope, **extra) == _theirs(oracle, kind, scope=scope, **extra)


def test_proven_missing_sample_matches_reference(oracle, tmp_path):
    root = tmp_path / "ds"
    root.mkdir()
    clip = root / "a.wav"
    kwargs = dict(
        scope="sample", filename=str(clip), sample_path=str(clip), roots=(root,)
    )
    ours = _ours("file_not_found", **kwargs)
    theirs = _theirs(oracle, "file_not_found", **kwargs)
    assert ours == theirs
    assert ours["disposition"] == "quarantine"
    # Same error pointing at a DIFFERENT file aborts on both sides.
    kwargs["filename"] = str(tmp_path / "model.bin")
    assert (
        _ours("file_not_found", **kwargs)
        == _theirs(oracle, "file_not_found", **kwargs)
        == {"scope": "sample", "reason_code": "backend_output_invalid", "disposition": "abort"}
    )


def test_missing_sample_outside_roots_aborts_on_both_sides(oracle, tmp_path):
    clip = tmp_path / "elsewhere" / "a.wav"
    kwargs = dict(
        scope="sample",
        filename=str(clip),
        sample_path=str(clip),
        roots=(tmp_path / "ds",),
    )
    assert _ours("file_not_found", **kwargs) == _theirs(oracle, "file_not_found", **kwargs)
