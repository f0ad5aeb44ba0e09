"""Postprocessing parity tests (reference postprocessing.py semantics)."""

import pytest

from ser_tpu._internal.runtime.postprocessing import (
    SegmentPostprocessingConfig,
    postprocess_frame_predictions,
)
from ser_tpu.runtime.schema import FramePrediction


def frame(start, end, emotion, confidence, probabilities=None):
    return FramePrediction(
        start_seconds=start,
        end_seconds=end,
        emotion=emotion,
        confidence=confidence,
        probabilities=probabilities,
    )


DEFAULT = SegmentPostprocessingConfig()


def test_empty_input():
    assert postprocess_frame_predictions([], config=DEFAULT) == []


def test_single_label_run_merges_to_one_segment():
    frames = [frame(i, i + 1, "happy", 0.9) for i in range(5)]
    segments = postprocess_frame_predictions(frames, config=DEFAULT)
    assert len(segments) == 1
    assert segments[0].emotion == "happy"
    assert segments[0].start_seconds == 0.0
    assert segments[0].end_seconds == 5.0
    assert segments[0].confidence == pytest.approx(0.9)


def test_smoothing_removes_single_frame_flicker():
    frames = [
        frame(0, 1, "sad", 0.9),
        frame(1, 2, "sad", 0.9),
        frame(2, 3, "happy", 0.95),  # isolated flicker
        frame(3, 4, "sad", 0.9),
        frame(4, 5, "sad", 0.9),
    ]
    segments = postprocess_frame_predictions(frames, config=DEFAULT)
    assert [s.emotion for s in segments] == ["sad"]


def test_hysteresis_blocks_low_confidence_switch():
    # Candidate switch at 0.5 < enter 0.6 while incumbent is confident: blocked.
    frames = [
        frame(0, 1, "sad", 0.9),
        frame(0, 1, "sad", 0.9),
        frame(1, 2, "sad", 0.9),
        frame(2, 3, "angry", 0.5),
        frame(2, 3, "angry", 0.5),
        frame(3, 4, "angry", 0.5),
    ]
    config = SegmentPostprocessingConfig(smoothing_window_frames=1)
    segments = postprocess_frame_predictions(frames, config=config)
    assert [s.emotion for s in segments] == ["sad"]


def test_hysteresis_allows_confident_switch():
    frames = [
        frame(0, 1, "sad", 0.9),
        frame(1, 2, "sad", 0.9),
        frame(2, 3, "angry", 0.95),
        frame(3, 4, "angry", 0.95),
    ]
    config = SegmentPostprocessingConfig(smoothing_window_frames=1)
    segments = postprocess_frame_predictions(frames, config=config)
    assert [s.emotion for s in segments] == ["sad", "angry"]
    assert segments[1].start_seconds == 2.0


def test_short_segment_merges_into_higher_confidence_neighbor():
    config = SegmentPostprocessingConfig(
        smoothing_window_frames=1,
        hysteresis_enter_confidence=0.0,
        hysteresis_exit_confidence=0.0,
        min_segment_duration_seconds=0.4,
    )
    frames = [
        frame(0.0, 1.0, "sad", 0.5),
        frame(1.0, 1.2, "happy", 0.99),  # 0.2 s < 0.4 s minimum
        frame(1.2, 2.2, "angry", 0.9),
    ]
    segments = postprocess_frame_predictions(frames, config=config)
    assert [s.emotion for s in segments] == ["sad", "angry"]
    # Short segment merged into 'angry' (higher confidence neighbor).
    assert segments[1].start_seconds == 1.0
    assert segments[1].end_seconds == 2.2


def test_merged_confidence_is_duration_weighted():
    config = SegmentPostprocessingConfig(
        smoothing_window_frames=1,
        hysteresis_enter_confidence=0.0,
        hysteresis_exit_confidence=0.0,
        min_segment_duration_seconds=0.5,
    )
    frames = [
        frame(0.0, 1.0, "sad", 0.8, {"sad": 0.8, "happy": 0.2}),
        frame(1.0, 1.25, "happy", 0.4, {"sad": 0.4, "happy": 0.6}),
    ]
    segments = postprocess_frame_predictions(frames, config=config)
    assert len(segments) == 1
    expected_conf = (0.8 * 1.0 + 0.4 * 0.25) / 1.25
    assert segments[0].confidence == pytest.approx(expected_conf)
    expected_sad = (0.8 * 1.0 + 0.4 * 0.25) / 1.25
    assert segments[0].probabilities["sad"] == pytest.approx(expected_sad)


def test_config_validation():
    with pytest.raises(ValueError):
        postprocess_frame_predictions(
            [frame(0, 1, "x", 1.0)],
            config=SegmentPostprocessingConfig(smoothing_window_frames=0),
        )
    with pytest.raises(ValueError):
        postprocess_frame_predictions(
            [frame(0, 1, "x", 1.0)],
            config=SegmentPostprocessingConfig(
                hysteresis_enter_confidence=0.3, hysteresis_exit_confidence=0.5
            ),
        )


def test_smoothing_tie_prefers_current_then_previous_then_lexical():
    # Window of 3 with all-distinct labels ties at count 1 → current label kept.
    frames = [
        frame(0, 1, "b", 1.0),
        frame(1, 2, "a", 1.0),
        frame(2, 3, "c", 1.0),
    ]
    config = SegmentPostprocessingConfig(
        smoothing_window_frames=3,
        hysteresis_enter_confidence=0.0,
        hysteresis_exit_confidence=0.0,
        min_segment_duration_seconds=0.0,
    )
    segments = postprocess_frame_predictions(frames, config=config)
    assert [s.emotion for s in segments] == ["b", "a", "c"]
