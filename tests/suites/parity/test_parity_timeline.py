"""Differential parity: segment canonicalization, timeline join, CSV export.

Reference stages: ``ser/_internal/utils/segment_canonicalization.py:143-185``
(sort → same-start winner → overlap truncation), ``timeline_utils.py:114-171``
(ms-resolution join + O(T+E) emotion lookup), ``timeline_utils.py:46-78``
(CSV bytes with 2-decimal rounding).
"""

from __future__ import annotations

from types import SimpleNamespace

from hypothesis import given, settings
from hypothesis import strategies as st

from ser_tpu._internal.config.schema import TimelineConfig
from ser_tpu._internal.utils.segment_canonicalization import canonicalize_segments
from ser_tpu._internal.utils.timeline import build_timeline, save_timeline_to_csv
from ser_tpu.domain import EmotionSegment, TimelineEntry, TranscriptWord

LABELS = ("angry", "calm", "happy", "neutral", "sad", "")

timestamps = st.floats(min_value=0.0, max_value=120.0, allow_nan=False, allow_infinity=False)
durations = st.floats(min_value=-0.5, max_value=10.0, allow_nan=False, allow_infinity=False)


@st.composite
def raw_segments(draw) -> list[dict]:
    """Messy segments: overlaps, zero/negative durations, shared starts, blanks."""
    count = draw(st.integers(min_value=0, max_value=12))
    segments = []
    for _ in range(count):
        start = draw(timestamps)
        segment = {
            "emotion": draw(st.sampled_from(LABELS)),
            "start_seconds": start,
            "end_seconds": start + draw(durations),
        }
        if draw(st.booleans()):
            segment["confidence"] = draw(
                st.one_of(
                    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
                    st.just(float("nan")),
                    st.none(),
                )
            )
        segments.append(segment)
    return segments


@st.composite
def transcript_words(draw) -> list[tuple[str, float, float]]:
    count = draw(st.integers(min_value=0, max_value=15))
    words = []
    for _ in range(count):
        start = draw(timestamps)
        words.append(
            (
                draw(st.sampled_from(["hello", "world", " pad ", "a", ""])),
                start,
                start + abs(draw(durations)),
            )
        )
    return words


@settings(max_examples=150, deadline=None)
@given(segments=raw_segments())
def test_canonicalization_parity(oracle, segments):
    reference = oracle.call("canonicalize", segments=segments)
    repo = canonicalize_segments([SimpleNamespace(**item) for item in segments])
    assert [(seg.emotion, seg.start_seconds, seg.end_seconds) for seg in repo] == reference


@settings(max_examples=150, deadline=None)
@given(words=transcript_words(), segments=raw_segments())
def test_build_timeline_parity(oracle, words, segments):
    # build_timeline consumes EmotionSegment NamedTuples (no confidence field).
    plain_segments = [
        (item["emotion"], item["start_seconds"], item["end_seconds"]) for item in segments
    ]
    reference = oracle.call("build_timeline", words=words, segments=plain_segments)
    repo = build_timeline(
        [TranscriptWord(*word) for word in words],
        [EmotionSegment(*segment) for segment in plain_segments],
    )
    assert [(entry.timestamp_seconds, entry.emotion, entry.speech) for entry in repo] == reference


@settings(max_examples=50, deadline=None)
@given(words=transcript_words(), segments=raw_segments())
def test_timeline_csv_bytes_parity(oracle, tmp_path_factory, words, segments):
    plain_segments = [
        (item["emotion"], item["start_seconds"], item["end_seconds"]) for item in segments
    ]
    rows = oracle.call("build_timeline", words=words, segments=plain_segments)
    reference_csv = oracle.call("timeline_csv", timeline=rows, file_name="clip.wav")

    out_dir = tmp_path_factory.mktemp("timeline-csv")
    path = save_timeline_to_csv(
        [TimelineEntry(*row) for row in rows],
        "clip.wav",
        timeline_config=TimelineConfig(folder=out_dir),
    )
    with open(path, "rb") as handle:
        assert handle.read() == reference_csv
