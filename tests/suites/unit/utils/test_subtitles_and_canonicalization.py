"""Subtitle rendering + segment canonicalization tests."""

import pytest

from ser_tpu._internal.config.schema import TimelineConfig
from ser_tpu._internal.utils.segment_canonicalization import canonicalize_segments
from ser_tpu._internal.utils.subtitles import (
    resolve_subtitle_export_request,
    save_timeline_to_subtitles,
    timeline_to_subtitle_cues,
)
from ser_tpu.domain import EmotionSegment, TimelineEntry
from ser_tpu.runtime.schema import SegmentPrediction


def test_canonicalize_merges_same_label_overlap():
    segments = [EmotionSegment("happy", 0.0, 2.0), EmotionSegment("happy", 1.5, 3.0)]
    result = canonicalize_segments(segments)
    assert len(result) == 1
    assert (result[0].start_seconds, result[0].end_seconds) == (0.0, 3.0)


def test_canonicalize_truncates_different_label_overlap():
    segments = [EmotionSegment("happy", 0.0, 2.0), EmotionSegment("sad", 1.0, 3.0)]
    result = canonicalize_segments(segments)
    assert [(s.emotion, s.start_seconds, s.end_seconds) for s in result] == [
        ("happy", 0.0, 1.0),
        ("sad", 1.0, 3.0),
    ]


def test_canonicalize_same_start_prefers_confidence_then_label():
    # SegmentPrediction carries confidence → higher wins.
    segments = [
        SegmentPrediction("sad", 0.0, 2.0, confidence=0.5),
        SegmentPrediction("angry", 0.0, 1.5, confidence=0.9),
    ]
    result = canonicalize_segments(segments)
    assert result[0].emotion == "angry"
    # Without confidence, lexical order wins.
    plain = [EmotionSegment("zeta", 0.0, 1.0), EmotionSegment("alpha", 0.0, 2.0)]
    assert canonicalize_segments(plain)[0].emotion == "alpha"


def test_canonicalize_drops_invalid():
    segments = [
        EmotionSegment("", 0.0, 1.0),
        EmotionSegment("ok", 2.0, 1.0),
        EmotionSegment("fine", 0.0, float("nan")),
    ]
    assert canonicalize_segments(segments) == []


def test_cues_skip_empty_speech_and_use_next_row_end():
    timeline = [
        TimelineEntry(0.0, "happy", "hello"),
        TimelineEntry(1.5, "happy", ""),
        TimelineEntry(2.0, "sad", "bye"),
    ]
    cues = timeline_to_subtitle_cues(timeline)
    assert len(cues) == 2
    assert cues[0].end_seconds == 1.5
    assert cues[1].end_seconds == 3.0  # last cue: default 1 s duration


def test_resolve_subtitle_request():
    assert resolve_subtitle_export_request(output_path=None, subtitle_format=None) is None
    assert resolve_subtitle_export_request(output_path="out.srt", subtitle_format=None) == (
        "srt",
        "out.srt",
    )
    with pytest.raises(ValueError):
        resolve_subtitle_export_request(output_path="out.txt", subtitle_format=None)
    with pytest.raises(ValueError):
        resolve_subtitle_export_request(output_path="   ", subtitle_format="srt")


@pytest.mark.parametrize("fmt,needle", [("srt", "-->"), ("vtt", "WEBVTT"), ("ass", "Dialogue:")])
def test_subtitle_rendering(tmp_path, fmt, needle):
    timeline = [TimelineEntry(0.0, "happy", "hello world")]
    path = save_timeline_to_subtitles(
        timeline,
        "clip.wav",
        subtitle_format=fmt,
        timeline_config=TimelineConfig(folder=tmp_path),
    )
    content = open(path, encoding="utf-8").read()
    assert needle in content
    assert "hello world (happy)" in content
    assert path.endswith(f"clip.{fmt}")


def test_srt_timestamps_format():
    timeline = [TimelineEntry(61.5, "", "word")]
    cues = timeline_to_subtitle_cues(timeline)
    from ser_tpu._internal.utils.subtitles import _ms_time

    assert _ms_time(cues[0].start_seconds, ",") == "00:01:01,500"
