"""Batch inference API through an injected tiny backend + trained artifact."""

import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[4] / "scripts"))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402


@pytest.fixture(scope="module")
def trained_medium(tmp_path_factory, monkeypatch_module=None):
    import dataclasses

    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.models.encoder_training import train_encoder_profile_model
    from tests.suites.integration.models.test_encoder_training_with_fakes import (
        TinyDspBackend,
    )

    root = tmp_path_factory.mktemp("batch_infer")
    build_dataset(root / "ds", actors=2, repetitions=2, seconds=2.2)
    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(root / "ds"),
                "SER_MODELS_FOLDER": str(root / "models"),
                "SER_TMP_FOLDER": str(root / "tmp"),
                "SER_ENABLE_MEDIUM_PROFILE": "1",
            }
        )
    )
    settings = dataclasses.replace(
        settings, nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(32,), max_iter=120)
    )
    backend = TinyDspBackend()
    train_encoder_profile_model(profile="medium", settings=settings, backend=backend)
    return settings, backend, sorted((root / "ds").rglob("*.wav"))


def test_infer_many_with_injected_backend(trained_medium, monkeypatch):
    settings, backend, files = trained_medium
    import ser_tpu._internal.repr.encoders as encoders

    monkeypatch.setattr(encoders, "build_encoder_backend", lambda *a, **k: backend)
    from ser_tpu.parallel.batch_inference import infer_many

    paths = [str(f) for f in files[:5]] + ["/missing.wav"]
    rows = infer_many(paths, profile="medium", settings=settings)
    assert len(rows) == 6
    ok = [row for row in rows if row.result is not None]
    assert len(ok) == 5
    for row in ok:
        assert row.result.schema_version == "v1"
        assert row.result.segments
        assert all(np.isfinite(f.confidence) for f in row.result.frames)
    failed = rows[-1]
    assert failed.result is None and "FileNotFoundError" in failed.error


def test_infer_many_rejects_fast_profile(trained_medium):
    settings, _, _ = trained_medium
    from ser_tpu.parallel.batch_inference import infer_many

    with pytest.raises(ValueError, match="fast"):
        infer_many(["x.wav"], profile="fast", settings=settings)


def test_infer_many_contains_mixed_failure_kinds(trained_medium, monkeypatch, tmp_path):
    """Missing files, undecodable bytes, and empty audio are all contained
    per-row while healthy rows still succeed (reference containment bar)."""
    settings, backend, files = trained_medium
    import ser_tpu._internal.repr.encoders as encoders

    monkeypatch.setattr(encoders, "build_encoder_backend", lambda *a, **k: backend)
    from ser_tpu.parallel.batch_inference import infer_many

    undecodable = tmp_path / "garbage.wav"
    undecodable.write_bytes(b"this is not RIFF data at all")
    truncated = tmp_path / "truncated.wav"
    truncated.write_bytes(b"RIFF\x00\x00\x00\x00WAVE")

    paths = [
        str(files[0]),
        "/missing/a.wav",
        str(undecodable),
        str(files[1]),
        str(truncated),
        "/missing/b.wav",
    ]
    rows = infer_many(paths, profile="medium", settings=settings)
    assert len(rows) == len(paths)
    assert [row.result is not None for row in rows] == [
        True, False, False, True, False, False,
    ]
    for row in rows:
        if row.result is None:
            assert row.error, f"failed row must carry an error: {row.file_path}"
        else:
            assert row.result.segments


def test_infer_many_all_failures_returns_rows_not_raise(trained_medium, monkeypatch):
    settings, backend, _files = trained_medium
    import ser_tpu._internal.repr.encoders as encoders

    monkeypatch.setattr(encoders, "build_encoder_backend", lambda *a, **k: backend)
    from ser_tpu.parallel.batch_inference import infer_many

    rows = infer_many(
        ["/gone/1.wav", "/gone/2.wav", "/gone/3.wav"], profile="medium", settings=settings
    )
    assert len(rows) == 3
    assert all(row.result is None and row.error for row in rows)


def test_infer_many_enforces_profile_and_consent_gates(tmp_path):
    """Batch inference is not a side door around the serving path's gates."""
    import dataclasses

    import pytest

    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.runtime.restricted_backends import RestrictedBackendError
    from ser_tpu.parallel.batch_inference import infer_many

    settings = build_settings_from_inputs(
        capture_settings_inputs(env={"SER_MODELS_DIR": str(tmp_path)})
    )
    # Disabled profile flag -> refused before any backend work.
    disabled = dataclasses.replace(
        settings,
        runtime_flags=dataclasses.replace(settings.runtime_flags, medium_profile=False),
    )
    with pytest.raises(ValueError, match="disabled"):
        infer_many(["/nonexistent.wav"], profile="medium", settings=disabled)
    # Restricted backend without consent -> license gate fires.
    research_on = dataclasses.replace(
        settings,
        runtime_flags=dataclasses.replace(
            settings.runtime_flags, accurate_research_profile=True
        ),
    )
    with pytest.raises(RestrictedBackendError):
        infer_many(
            ["/nonexistent.wav"], profile="accurate-research", settings=research_on
        )
