"""Hypothesis property tests for postprocessing + canonicalization
(reference uses Hypothesis for these owners, SURVEY §4)."""

from hypothesis import given, settings as hyp_settings, strategies as st

from ser_tpu._internal.runtime.postprocessing import (
    SegmentPostprocessingConfig,
    postprocess_frame_predictions,
)
from ser_tpu._internal.utils.segment_canonicalization import canonicalize_segments
from ser_tpu.domain import EmotionSegment
from ser_tpu.runtime.schema import FramePrediction

_LABELS = st.sampled_from(["angry", "calm", "happy", "sad"])


@st.composite
def frame_sequences(draw):
    count = draw(st.integers(min_value=1, max_value=24))
    frames = []
    for i in range(count):
        frames.append(
            FramePrediction(
                start_seconds=float(i),
                end_seconds=float(i + 1),
                emotion=draw(_LABELS),
                confidence=draw(
                    st.floats(min_value=0.0, max_value=1.0, allow_nan=False)
                ),
                probabilities=None,
            )
        )
    return frames


@given(frame_sequences())
@hyp_settings(max_examples=60, deadline=None)
def test_postprocessing_invariants(frames):
    segments = postprocess_frame_predictions(
        frames, config=SegmentPostprocessingConfig()
    )
    assert segments, "non-empty frames must yield at least one segment"
    # Coverage: segments span exactly the frame range.
    assert segments[0].start_seconds == frames[0].start_seconds
    assert segments[-1].end_seconds == frames[-1].end_seconds
    for left, right in zip(segments, segments[1:]):
        assert left.end_seconds <= right.start_seconds + 1e-9
        assert left.emotion != right.emotion  # adjacent same labels merged
    for segment in segments:
        assert segment.end_seconds > segment.start_seconds
        assert 0.0 <= segment.confidence <= 1.0 + 1e-9
        assert segment.emotion in {"angry", "calm", "happy", "sad"}


@st.composite
def raw_segments(draw):
    count = draw(st.integers(min_value=0, max_value=15))
    segments = []
    for _ in range(count):
        start = draw(st.floats(min_value=0.0, max_value=50.0, allow_nan=False))
        duration = draw(st.floats(min_value=-1.0, max_value=10.0, allow_nan=False))
        segments.append(EmotionSegment(draw(_LABELS), start, start + duration))
    return segments


@given(raw_segments())
@hyp_settings(max_examples=60, deadline=None)
def test_canonicalization_invariants(segments):
    canonical = canonicalize_segments(segments)
    for segment in canonical:
        assert segment.end_seconds > segment.start_seconds
        assert segment.emotion
    for left, right in zip(canonical, canonical[1:]):
        assert left.end_seconds <= right.start_seconds
        # No mergeable adjacency survives (merge rule is EXACT touching —
        # same-label segments separated by any positive gap stay distinct).
        if left.end_seconds == right.start_seconds:
            assert left.emotion != right.emotion
    # Idempotence: canonicalizing canonical output is a no-op.
    assert canonicalize_segments(canonical) == canonical
