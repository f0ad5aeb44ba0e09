"""Compatibility between the detailed output schema and the legacy segment API.

Mirrors the reference's dual-schema contract
(``tests/suites/unit/runtime/test_dual_schema_compat.py``): the legacy
``predict_emotions`` surface must be a pure projection of the detailed
``InferenceResult`` — identical boundaries and emotions, confidences and
frame-level predictions dropped, never recomputed.
"""

from unittest import mock

from ser_tpu.domain import EmotionSegment
from ser_tpu.runtime.schema import (
    OUTPUT_SCHEMA_VERSION,
    FramePrediction,
    InferenceResult,
    SegmentPrediction,
    to_legacy_emotion_segments,
)


def _detailed() -> InferenceResult:
    return InferenceResult(
        schema_version=OUTPUT_SCHEMA_VERSION,
        segments=[
            SegmentPrediction(
                emotion="happy",
                start_seconds=0.0,
                end_seconds=1.5,
                confidence=0.9,
                probabilities={"happy": 0.9, "sad": 0.1},
            ),
            SegmentPrediction(
                emotion="sad",
                start_seconds=1.5,
                end_seconds=3.0,
                confidence=0.7,
                probabilities={"happy": 0.2, "sad": 0.8},
            ),
        ],
        frames=[
            FramePrediction(
                start_seconds=0.0,
                end_seconds=1.0,
                emotion="happy",
                confidence=0.9,
                probabilities={"happy": 0.9, "sad": 0.1},
            )
        ],
    )


def test_adapter_preserves_segment_boundaries_exactly():
    assert to_legacy_emotion_segments(_detailed()) == [
        EmotionSegment("happy", 0.0, 1.5),
        EmotionSegment("sad", 1.5, 3.0),
    ]


def test_adapter_on_empty_result_returns_empty_list():
    empty = InferenceResult(
        schema_version=OUTPUT_SCHEMA_VERSION, segments=[], frames=[]
    )
    assert to_legacy_emotion_segments(empty) == []


def test_legacy_predict_emotions_delegates_to_detailed():
    """The legacy entrypoint is adapter(detailed(...)), not a second pipeline."""
    from ser_tpu._internal.models import emotion_model

    detailed = _detailed()
    with mock.patch.object(
        emotion_model, "predict_emotions_detailed", return_value=detailed
    ) as spy:
        segments = emotion_model.predict_emotions(
            "clip.wav", settings=mock.sentinel.settings, loaded=mock.sentinel.model
        )
    spy.assert_called_once_with(
        "clip.wav", settings=mock.sentinel.settings, loaded=mock.sentinel.model
    )
    assert segments == [
        EmotionSegment("happy", 0.0, 1.5),
        EmotionSegment("sad", 1.5, 3.0),
    ]
