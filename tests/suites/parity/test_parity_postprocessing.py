"""Differential parity: segment postprocessing vs the reference.

North star: bit-matched ``infer()`` outputs. The decisive host-side stage is
5-stage postprocessing (reference
``ser/_internal/runtime/postprocessing.py:107-325``). Every case runs the SAME
frame predictions through this repo's implementation and the reference's (in
the oracle subprocess) and asserts float-exact equality of the resulting
segments — labels, boundaries, merged confidences, and merged probability
maps.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ser_tpu._internal.runtime.postprocessing import (
    SegmentPostprocessingConfig,
    postprocess_frame_predictions,
)
from ser_tpu.runtime.schema import FramePrediction

LABELS = ("angry", "calm", "happy", "neutral", "sad")

confidences = st.floats(
    min_value=0.0, max_value=1.0, allow_nan=False, allow_infinity=False
)


@st.composite
def frame_sequences(draw) -> list[dict]:
    """Ordered frame predictions with optional probability maps."""
    count = draw(st.integers(min_value=1, max_value=24))
    frame_seconds = draw(
        st.floats(min_value=0.05, max_value=2.0, allow_nan=False, allow_infinity=False)
    )
    with_probabilities = draw(st.booleans())
    frames = []
    for index in range(count):
        probabilities = None
        if with_probabilities and draw(st.booleans()):
            chosen = draw(
                st.lists(st.sampled_from(LABELS), min_size=1, max_size=5, unique=True)
            )
            probabilities = {label: draw(confidences) for label in chosen}
        frames.append(
            {
                "start_seconds": index * frame_seconds,
                "end_seconds": (index + 1) * frame_seconds,
                "emotion": draw(st.sampled_from(LABELS)),
                "confidence": draw(confidences),
                "probabilities": probabilities,
            }
        )
    return frames


@st.composite
def postprocessing_configs(draw) -> dict:
    enter = draw(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
    exit_confidence = draw(st.floats(min_value=0.0, max_value=enter, allow_nan=False))
    return {
        "smoothing_window_frames": draw(st.integers(min_value=1, max_value=7)),
        "hysteresis_enter_confidence": enter,
        "hysteresis_exit_confidence": exit_confidence,
        "min_segment_duration_seconds": draw(
            st.floats(min_value=0.0, max_value=3.0, allow_nan=False)
        ),
    }


def _run_repo(frames: list[dict], config: dict) -> list[dict]:
    segments = postprocess_frame_predictions(
        [FramePrediction(**frame) for frame in frames],
        config=SegmentPostprocessingConfig(**config),
    )
    return [
        {
            "emotion": seg.emotion,
            "start_seconds": seg.start_seconds,
            "end_seconds": seg.end_seconds,
            "confidence": seg.confidence,
            "probabilities": seg.probabilities,
        }
        for seg in segments
    ]


@settings(max_examples=150, deadline=None)
@given(frames=frame_sequences(), config=postprocessing_configs())
def test_postprocessing_bitwise_parity(oracle, frames, config):
    reference = oracle.call("postprocess", frames=frames, config=config)
    repo = _run_repo(frames, config)
    assert repo == reference


def test_postprocessing_default_config_parity(oracle):
    """Catalog-default knobs (3/0.60/0.45/0.40) on a crafted jittery sequence."""
    config = {
        "smoothing_window_frames": 3,
        "hysteresis_enter_confidence": 0.60,
        "hysteresis_exit_confidence": 0.45,
        "min_segment_duration_seconds": 0.40,
    }
    frames = []
    pattern = ["happy", "happy", "sad", "happy", "angry", "angry", "sad", "sad", "happy"]
    confidences_seq = [0.9, 0.3, 0.7, 0.5, 0.61, 0.44, 0.8, 0.2, 0.95]
    for index, (label, confidence) in enumerate(zip(pattern, confidences_seq)):
        frames.append(
            {
                "start_seconds": index * 0.25,
                "end_seconds": (index + 1) * 0.25,
                "emotion": label,
                "confidence": confidence,
                "probabilities": {label: confidence, "neutral": 1.0 - confidence},
            }
        )
    assert _run_repo(frames, config) == oracle.call(
        "postprocess", frames=frames, config=config
    )


@pytest.mark.parametrize(
    "config",
    [
        {"smoothing_window_frames": 0},
        {"hysteresis_enter_confidence": -0.1},
        {"hysteresis_exit_confidence": -0.5},
        {"hysteresis_enter_confidence": 0.3, "hysteresis_exit_confidence": 0.4},
        {"min_segment_duration_seconds": -1.0},
    ],
)
def test_postprocessing_config_validation_parity(oracle, config):
    """Invalid configs raise on both sides (reference postprocessing.py:90-104)."""
    full = {
        "smoothing_window_frames": 3,
        "hysteresis_enter_confidence": 0.60,
        "hysteresis_exit_confidence": 0.45,
        "min_segment_duration_seconds": 0.40,
        **config,
    }
    frames = [
        {
            "start_seconds": 0.0,
            "end_seconds": 1.0,
            "emotion": "happy",
            "confidence": 0.9,
            "probabilities": None,
        }
    ]
    from reference_oracle import OracleRemoteError

    with pytest.raises(OracleRemoteError) as reference_error:
        oracle.call("postprocess", frames=frames, config=full)
    with pytest.raises(ValueError):
        _run_repo(frames, full)
    assert reference_error.value.error_type == "ValueError"
