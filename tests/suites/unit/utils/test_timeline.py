"""Timeline merge/persist tests (reference timeline_utils semantics)."""

import numpy as np

from ser_tpu._internal.config.schema import TimelineConfig
from ser_tpu._internal.utils.timeline import build_timeline, save_timeline_to_csv
from ser_tpu.domain import EmotionSegment, TimelineEntry, TranscriptWord


def test_empty_inputs():
    assert build_timeline([], []) == []


def test_words_and_emotions_merge_on_millisecond_keys():
    words = [
        TranscriptWord("hello", 0.0, 0.5),
        TranscriptWord("world", 0.5, 1.0),
    ]
    emotions = [EmotionSegment("happy", 0.0, 2.0)]
    timeline = build_timeline(words, emotions)
    # Rows: word starts 0.0 and 0.5, plus terminal emotion boundary 2.0.
    assert [entry.timestamp_seconds for entry in timeline] == [0.0, 0.5, 2.0]
    assert timeline[0].speech == "hello"
    assert timeline[0].emotion == "happy"
    assert timeline[1].emotion == "happy"
    # Terminal row carries the last emotion (closed right endpoint rule).
    assert timeline[2].emotion == "happy"
    assert timeline[2].speech == ""


def test_same_start_words_join_with_spaces():
    words = [TranscriptWord("a", 1.0, 1.2), TranscriptWord("b", 1.0, 1.4)]
    timeline = build_timeline(words, [])
    assert len(timeline) == 1
    assert timeline[0].speech == "a b"


def test_emotion_changes_produce_rows():
    emotions = [EmotionSegment("sad", 0.0, 1.0), EmotionSegment("angry", 1.0, 2.0)]
    timeline = build_timeline([], emotions)
    assert [(e.timestamp_seconds, e.emotion) for e in timeline] == [
        (0.0, "sad"),
        (1.0, "angry"),
        (2.0, "angry"),
    ]


def test_overlapping_segments_are_canonicalized():
    emotions = [EmotionSegment("sad", 0.0, 2.0), EmotionSegment("angry", 1.0, 3.0)]
    timeline = build_timeline([], emotions)
    assert [(e.timestamp_seconds, e.emotion) for e in timeline] == [
        (0.0, "sad"),
        (1.0, "angry"),
        (3.0, "angry"),
    ]


def test_csv_round_trip(tmp_path):
    timeline = [TimelineEntry(1.234, "happy", "hi there")]
    path = save_timeline_to_csv(
        timeline, "clip.wav", timeline_config=TimelineConfig(folder=tmp_path)
    )
    content = open(path, encoding="utf-8").read().splitlines()
    assert content[0] == "Time (s),Emotion,Speech"
    assert content[1] == "1.23,happy,hi there"
    assert path.endswith("clip.csv")
