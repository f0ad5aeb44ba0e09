"""Per-owner tests for ``_internal/runtime/profile_execution.py``.

The ONE parameterized windowed pass that replaces the reference's per-profile
duplication (``medium_execution.py:52-98`` and the accurate twin): encode →
window → pool → predict → postprocess, with pure fakes on either side.
"""

import numpy as np
import pytest

from ser_tpu._internal.repr.backend import EncodedSequence
from ser_tpu._internal.runtime.postprocessing import SegmentPostprocessingConfig
from ser_tpu._internal.runtime.profile_execution import run_windowed_inference_once


class _FakeBackend:
    """Ten 1-second frames of a 2D embedding whose value encodes the frame."""

    backend_id = "fake"

    def __init__(self, n_frames=10, dim=4):
        self.n_frames = n_frames
        self.dim = dim
        self.calls = 0

    def encode_sequence(self, audio, sample_rate):
        self.calls += 1
        emb = np.arange(self.n_frames, dtype=np.float64)[:, None] * np.ones(self.dim)
        starts = np.arange(self.n_frames, dtype=np.float64)
        return EncodedSequence(
            embeddings=emb,
            frame_start_seconds=starts,
            frame_end_seconds=starts + 1.0,
            backend_id=self.backend_id,
        )


class _FakeModel:
    """Binary head: class 'hi' when the first feature exceeds its median."""

    classes_ = np.asarray(["lo", "hi"])

    def __init__(self):
        self.seen = []

    def predict_proba(self, features):
        self.seen.append(np.asarray(features))
        hot = (features[:, 0] > np.median(features[:, 0])).astype(np.float64)
        p_hi = 0.1 + 0.8 * hot
        return np.stack([1.0 - p_hi, p_hi], axis=1)

    def predict(self, features):
        return self.classes_[(features[:, 0] > np.median(features[:, 0])).astype(int)]


def _run(pooling_strategy, *, expected_feature_size=None, backend=None, encode_fn=None):
    backend = backend or _FakeBackend()
    return run_windowed_inference_once(
        audio=np.zeros(16000 * 10, dtype=np.float32),
        sample_rate=16000,
        backend=backend,
        model=_FakeModel(),
        pool_window_size_seconds=2.0,
        pool_window_stride_seconds=2.0,
        pooling_strategy=pooling_strategy,
        postprocessing_config=SegmentPostprocessingConfig(),
        output_schema_version="v2",
        expected_feature_size=expected_feature_size,
        encode_fn=encode_fn,
    )


def test_mean_pooling_produces_frames_and_segments():
    result = _run("mean")
    assert result.schema_version == "v2"
    assert len(result.frames) == 5  # 10 s of frames / 2 s windows
    assert result.frames[0].start_seconds == 0.0
    assert result.frames[-1].end_seconds == 10.0
    # Window means over embeddings valued by frame index: first window frames
    # {0,1} → mean 0.5 feature, last {8,9} → 8.5; labels follow the fake head.
    assert result.frames[0].emotion == "lo"
    assert result.frames[-1].emotion == "hi"
    assert result.segments  # postprocessing emits at least one merged segment


def test_mean_std_pooling_doubles_feature_width():
    backend = _FakeBackend(dim=4)
    model = _FakeModel()
    result = run_windowed_inference_once(
        audio=np.zeros(16000 * 10, dtype=np.float32),
        sample_rate=16000,
        backend=backend,
        model=model,
        pool_window_size_seconds=2.0,
        pool_window_stride_seconds=2.0,
        pooling_strategy="mean_std",
        postprocessing_config=SegmentPostprocessingConfig(),
        output_schema_version="v2",
        expected_feature_size=8,  # mean ++ std
    )
    assert model.seen[0].shape == (5, 8)
    assert len(result.frames) == 5


def test_feature_size_mismatch_raises_before_prediction():
    with pytest.raises(ValueError, match="Pooled feature size mismatch"):
        _run("mean", expected_feature_size=99)


def test_explicit_encode_fn_bypasses_backend_encode():
    backend = _FakeBackend()
    replacement = _FakeBackend(n_frames=4)

    def encode_fn(audio, sr):
        return replacement.encode_sequence(audio, sr)

    result = _run("mean", backend=backend, encode_fn=encode_fn)
    assert backend.calls == 0
    assert replacement.calls == 1
    assert len(result.frames) == 2  # 4 s of frames / 2 s windows
