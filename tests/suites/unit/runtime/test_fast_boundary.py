"""Per-owner tests for ``_internal/runtime/fast_boundary.py``.

Parity surface: reference ``fast_public_boundary.py`` — single-flight load,
typed error mapping (missing artifact → ModelUnavailableError, corrupt →
ModelLoadError), execution wrapped by the retry policy.
"""

import numpy as np
import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.models import artifacts, emotion_model
from ser_tpu._internal.runtime import fast_boundary
from ser_tpu._internal.runtime.errors import (
    InferenceExecutionError,
    ModelLoadError,
    ModelUnavailableError,
)
from ser_tpu.runtime.contracts import InferenceRequest
from ser_tpu.runtime.schema import InferenceResult


def _settings(tmp_path, **env):
    base = {
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
        "SER_TRANSCRIPTS_FOLDER": str(tmp_path / "transcripts"),
    }
    base.update(env)
    return build_settings_from_inputs(capture_settings_inputs(env=base))


def _request(tmp_path):
    return InferenceRequest(file_path=str(tmp_path / "clip.wav"), language="en")


def test_missing_artifact_maps_to_model_unavailable(tmp_path):
    settings = _settings(tmp_path)
    with pytest.raises(ModelUnavailableError, match="ser --train"):
        fast_boundary.run_fast_inference(_request(tmp_path), settings=settings)


def test_corrupt_artifact_maps_to_model_load_error(tmp_path, monkeypatch):
    settings = _settings(tmp_path)

    def broken_load(**kwargs):
        raise artifacts.ArtifactError("envelope checksum mismatch")

    monkeypatch.setattr(emotion_model, "load_model", broken_load)
    with pytest.raises(ModelLoadError, match="checksum mismatch"):
        fast_boundary.run_fast_inference(_request(tmp_path), settings=settings)


def test_successful_path_returns_prediction_result(tmp_path, monkeypatch):
    settings = _settings(tmp_path)
    sentinel = InferenceResult(schema_version="v2", segments=(), frames=())

    monkeypatch.setattr(emotion_model, "load_model", lambda **kw: object())
    monkeypatch.setattr(
        emotion_model,
        "predict_emotions_detailed",
        lambda file_path, settings, loaded: sentinel,
    )
    result = fast_boundary.run_fast_inference(_request(tmp_path), settings=settings)
    assert result is sentinel


def test_unexpected_exception_maps_to_execution_error(tmp_path, monkeypatch):
    settings = _settings(tmp_path)
    monkeypatch.setattr(emotion_model, "load_model", lambda **kw: object())

    def explode(file_path, settings, loaded):
        raise RuntimeError("device wedged")

    monkeypatch.setattr(emotion_model, "predict_emotions_detailed", explode)
    with pytest.raises(InferenceExecutionError, match="RuntimeError: device wedged"):
        fast_boundary.run_fast_inference(_request(tmp_path), settings=settings)


def test_valueerror_subclasses_keep_validation_classification(tmp_path, monkeypatch):
    # numpy's LinAlgError IS-A ValueError: the boundary's classification rule
    # (typed/validation errors pass through) must hold for subclasses too.
    settings = _settings(tmp_path)
    monkeypatch.setattr(emotion_model, "load_model", lambda **kw: object())

    def singular(file_path, settings, loaded):
        raise np.linalg.LinAlgError("singular")

    monkeypatch.setattr(emotion_model, "predict_emotions_detailed", singular)
    with pytest.raises(np.linalg.LinAlgError):
        fast_boundary.run_fast_inference(_request(tmp_path), settings=settings)


def test_validation_errors_keep_their_type(tmp_path, monkeypatch):
    settings = _settings(tmp_path)
    monkeypatch.setattr(emotion_model, "load_model", lambda **kw: object())

    def invalid(file_path, settings, loaded):
        raise ValueError("audio too short")

    monkeypatch.setattr(emotion_model, "predict_emotions_detailed", invalid)
    with pytest.raises(ValueError, match="audio too short"):
        fast_boundary.run_fast_inference(_request(tmp_path), settings=settings)
