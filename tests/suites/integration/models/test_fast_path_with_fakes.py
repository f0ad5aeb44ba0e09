"""Fast-path inference through injected deterministic doubles.

Mirrors the reference integration strategy (SURVEY.md §4): a deterministic
classifier stub + hand-built feature frames, no real models or audio.
"""

import logging

import numpy as np
import pytest

from ser_tpu._internal.features import FeatureFrame
from ser_tpu._internal.models.fast_path import predict_emotions_detailed_with_model

logger = logging.getLogger("test")


class StubClassifier:
    """Deterministic classifier: first feature component picks the class."""

    classes_ = np.array(["calm", "happy"])

    def predict(self, X):
        return np.where(X[:, 0] > 0, "happy", "calm")

    def predict_proba(self, X):
        happy = 1.0 / (1.0 + np.exp(-X[:, 0]))
        return np.stack([1.0 - happy, happy], axis=1)


def _frames(values):
    return [
        FeatureFrame(
            features=np.array([v, 0.0], dtype=np.float64),
            start_seconds=float(i),
            end_seconds=float(i + 1),
        )
        for i, v in enumerate(values)
    ]


def test_detailed_inference_with_stub():
    result = predict_emotions_detailed_with_model(
        "fake.wav",
        model=StubClassifier(),
        expected_feature_size=2,
        output_schema_version="v1",
        extract_feature_frames_fn=lambda _: _frames([3.0, 3.0, -3.0]),
        logger=logger,
    )
    assert result.schema_version == "v1"
    assert [f.emotion for f in result.frames] == ["happy", "happy", "calm"]
    assert [s.emotion for s in result.segments] == ["happy", "calm"]
    assert result.segments[0].start_seconds == 0.0
    assert result.segments[0].end_seconds == 2.0
    assert result.frames[0].confidence == pytest.approx(1 / (1 + np.exp(-3.0)))
    assert set(result.frames[0].probabilities) == {"calm", "happy"}


def test_feature_size_mismatch_raises():
    with pytest.raises(ValueError, match="size mismatch"):
        predict_emotions_detailed_with_model(
            "fake.wav",
            model=StubClassifier(),
            expected_feature_size=5,
            output_schema_version="v1",
            extract_feature_frames_fn=lambda _: _frames([1.0]),
            logger=logger,
        )


def test_model_without_proba_falls_back_to_unit_confidence():
    class NoProba:
        def predict(self, X):
            return np.array(["calm"] * len(X))

    result = predict_emotions_detailed_with_model(
        "fake.wav",
        model=NoProba(),
        expected_feature_size=None,
        output_schema_version="v1",
        extract_feature_frames_fn=lambda _: _frames([1.0, 2.0]),
        logger=logger,
    )
    assert all(f.confidence == 1.0 for f in result.frames)
    assert all(f.probabilities is None for f in result.frames)
    assert result.segments[0].probabilities is None


def test_empty_frames_yield_empty_result():
    result = predict_emotions_detailed_with_model(
        "fake.wav",
        model=StubClassifier(),
        expected_feature_size=None,
        output_schema_version="v1",
        extract_feature_frames_fn=lambda _: [],
        logger=logger,
    )
    assert result.frames == [] and result.segments == []
