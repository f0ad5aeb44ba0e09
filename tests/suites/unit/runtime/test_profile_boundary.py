"""Per-owner tests for ``_internal/runtime/profile_boundary.py``.

Behavior spec: the reference's three per-profile boundary modules
(``medium_public_boundary.py:524-554`` et al.) folded into ONE generic
boundary — single-flight per (profile, model), typed error classification,
device-OOM → transient conversion, and the CPU-fallback attempt after the
transient budget is exhausted.
"""

from __future__ import annotations

import dataclasses

import numpy as np
import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.models.artifacts import LoadedModel
from ser_tpu._internal.repr.backend import EncodedSequence
from ser_tpu._internal.runtime import profile_boundary as pb
from ser_tpu._internal.runtime.errors import (
    InferenceExecutionError,
    ModelUnavailableError,
    TransientInferenceError,
)
from ser_tpu.runtime.contracts import InferenceRequest


class _StubHead:
    classes_ = np.array(["happy", "sad"])

    def predict(self, x):
        return np.array(["happy"] * len(x))

    def predict_proba(self, x):
        return np.tile(np.array([[0.9, 0.1]]), (len(x), 1))


class _StubBackend:
    backend_id = "jax_xlsr"
    feature_dim = 4

    def encode_sequence(self, audio, sample_rate):
        n = max(1, int(audio.size // (sample_rate * 0.5)))
        starts = np.arange(n, dtype=np.float64) * 0.5
        return EncodedSequence(
            embeddings=np.ones((n, 4), dtype=np.float32),
            frame_start_seconds=starts,
            frame_end_seconds=starts + 0.5,
            backend_id=self.backend_id,
        )


def _settings(tmp_path, **extra):
    env = {
        "SER_DATASET_FOLDER": str(tmp_path / "ds"),
        "SER_TMP_FOLDER": str(tmp_path / "tmp"),
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
        "SER_MEDIUM_TIMEOUT_SECONDS": "0",
    }
    env.update(extra)
    return build_settings_from_inputs(capture_settings_inputs(env=env))


def _spec(backend_factory):
    return pb.ProfileBoundarySpec(
        profile="medium",
        backend_id="jax_xlsr",
        model_id=None,
        pooling_strategy="mean_std",
        backend_factory=backend_factory,
        artifact_file_name="ser_model_medium.pkl",
    )


def _request(tmp_path):
    from ser_tpu._internal.utils.audio_io import write_wav

    clip = tmp_path / "clip.wav"
    sr = 16000
    t = np.arange(sr * 2) / sr
    write_wav(clip, (0.4 * np.sin(2 * np.pi * 220 * t)).astype(np.float32), sr)
    return InferenceRequest(file_path=str(clip), language="en")


def _stub_loaded(*_args, **_kwargs):
    return LoadedModel(model=_StubHead(), expected_feature_size=8)


def test_missing_artifact_is_model_unavailable(tmp_path):
    settings = _settings(tmp_path)
    with pytest.raises(ModelUnavailableError, match="ser --train"):
        pb.run_profile_inference(
            _request(tmp_path),
            spec=_spec(lambda s, d: _StubBackend()),
            settings=settings,
        )


def test_happy_path_produces_segments(tmp_path, monkeypatch):
    monkeypatch.setattr(pb, "_load_model", _stub_loaded)
    result = pb.run_profile_inference(
        _request(tmp_path),
        spec=_spec(lambda s, d: _StubBackend()),
        settings=_settings(tmp_path),
    )
    assert result.segments
    assert result.segments[0].emotion == "happy"


def test_device_oom_converts_to_transient_and_falls_back_to_cpu(tmp_path, monkeypatch):
    """An XLA RESOURCE_EXHAUSTED during the accelerator attempt must be
    classified transient; once the transient budget exhausts, the boundary
    runs the CPU-fallback attempt (reference medium_public_boundary.py:548-554)."""
    monkeypatch.setattr(pb, "_load_model", _stub_loaded)
    device_kinds: list[str] = []

    class _OOMBackend(_StubBackend):
        def encode_sequence(self, audio, sample_rate):
            raise RuntimeError(
                "RESOURCE_EXHAUSTED: Out of memory while trying to allocate "
                "1073741824 bytes."
            )

    def factory(settings, device_kind):
        device_kinds.append(device_kind)
        return _OOMBackend() if device_kind == "auto" else _StubBackend()

    # Default: the hard-OOM shortcut fails over to CPU immediately (a
    # deterministic OOM would burn the whole retry ladder to the same end).
    settings = _settings(tmp_path, SER_MEDIUM_MAX_TRANSIENT_RETRIES="1")
    result = pb.run_profile_inference(_request(tmp_path), spec=_spec(factory), settings=settings)
    assert result.segments
    assert device_kinds == ["auto", "cpu"]

    # Shortcut disabled (reference RETRY_NEXT_PRECISION semantics): the
    # transient budget is consumed on-device before the CPU fallback.
    device_kinds.clear()
    settings = _settings(
        tmp_path,
        SER_MEDIUM_MAX_TRANSIENT_RETRIES="1",
        SER_TRANSCRIPTION_HBM_HARD_OOM_SHORTCUT="0",
    )
    result = pb.run_profile_inference(_request(tmp_path), spec=_spec(factory), settings=settings)
    assert result.segments
    assert device_kinds == ["auto", "auto", "cpu"]


def test_unknown_error_is_execution_error(tmp_path, monkeypatch):
    monkeypatch.setattr(pb, "_load_model", _stub_loaded)

    class _BrokenBackend(_StubBackend):
        def encode_sequence(self, audio, sample_rate):
            raise RuntimeError("novel defect")

    with pytest.raises(InferenceExecutionError, match="novel defect"):
        pb.run_profile_inference(
            _request(tmp_path),
            spec=_spec(lambda s, d: _BrokenBackend()),
            settings=_settings(tmp_path),
        )


def test_typed_transient_errors_pass_through_retry_then_fallback(tmp_path, monkeypatch):
    monkeypatch.setattr(pb, "_load_model", _stub_loaded)
    attempts: list[str] = []

    class _FlakyBackend(_StubBackend):
        def encode_sequence(self, audio, sample_rate):
            raise TransientInferenceError("flaky accelerator", profile="medium")

    def factory(settings, device_kind):
        attempts.append(device_kind)
        return _FlakyBackend() if device_kind == "auto" else _StubBackend()

    settings = _settings(tmp_path, SER_MEDIUM_MAX_TRANSIENT_RETRIES="0")
    result = pb.run_profile_inference(_request(tmp_path), spec=_spec(factory), settings=settings)
    assert result.segments
    assert attempts == ["auto", "cpu"]


def test_single_flight_serializes_same_profile_model(tmp_path, monkeypatch):
    """Two concurrent inferences on one (profile, model) key never overlap
    inside the boundary (reference single-flight semantics)."""
    import threading
    import time as _time

    monkeypatch.setattr(pb, "_load_model", _stub_loaded)
    active = {"now": 0, "peak": 0}
    lock = threading.Lock()

    class _SlowBackend(_StubBackend):
        def encode_sequence(self, audio, sample_rate):
            with lock:
                active["now"] += 1
                active["peak"] = max(active["peak"], active["now"])
            _time.sleep(0.15)
            with lock:
                active["now"] -= 1
            return super().encode_sequence(audio, sample_rate)

    settings = _settings(tmp_path)
    request = _request(tmp_path)
    spec = _spec(lambda s, d: _SlowBackend())

    def run():
        pb.run_profile_inference(request, spec=spec, settings=settings)

    threads = [threading.Thread(target=run) for _ in range(3)]
    for thread in threads:
        thread.start()
    for thread in threads:
        thread.join()
    assert active["peak"] == 1


def test_runtime_config_honors_profile_overrides(tmp_path):
    settings = _settings(tmp_path, SER_MEDIUM_POOL_WINDOW_SIZE_SECONDS="2.5")
    runtime = pb._runtime_config(settings, "medium")
    assert runtime.pool_window_size_seconds == 2.5


def test_spec_is_frozen():
    spec = _spec(lambda s, d: _StubBackend())
    with pytest.raises(dataclasses.FrozenInstanceError):
        spec.profile = "fast"  # type: ignore[misc]
