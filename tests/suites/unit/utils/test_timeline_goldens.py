"""Merged-timeline golden rows (reference timeline_utils.py:114-171 semantics).

Pins the full merge surface at once: ms-resolution word joins, same-start
word concatenation, segment canonicalization (same-label adjacency), emotion
attribution per row, and the terminal row at the last segment's end.
"""

import json
from pathlib import Path

from ser_tpu._internal.utils.timeline import build_timeline
from ser_tpu.domain import EmotionSegment, TranscriptWord

GOLDEN = Path(__file__).resolve().parents[3] / "fixtures/timeline/golden_merged_rows.json"


def _inputs():
    words = [
        TranscriptWord("kids", 0.30, 0.55),
        TranscriptWord("are", 0.55, 0.70),
        TranscriptWord("talking", 0.70, 1.20),
        TranscriptWord("by", 1.95, 2.10),
        TranscriptWord("the", 2.10, 2.25),
        TranscriptWord("door", 2.25, 2.80),
        TranscriptWord("door", 2.25, 2.90),  # same-start duplicate joins the row
    ]
    segments = [
        EmotionSegment("neutral", 0.0, 1.5),
        EmotionSegment("happy", 1.5, 2.0),
        EmotionSegment("happy", 2.0, 3.0),  # same-label adjacency canonicalizes
    ]
    return words, segments


def test_merged_rows_match_golden():
    words, segments = _inputs()
    rows = build_timeline(words, segments)
    got = [
        {"t": row.timestamp_seconds, "emotion": row.emotion, "speech": row.speech}
        for row in rows
    ]
    expected = json.loads(GOLDEN.read_text(encoding="utf-8"))
    assert got == expected


def test_golden_encodes_the_contract_claims():
    expected = json.loads(GOLDEN.read_text(encoding="utf-8"))
    # Same-start words concatenate into one row.
    assert any(row["speech"] == "door door" for row in expected)
    # Canonicalized same-label segments yield ONE boundary row at 1.5s only.
    boundary_rows = [row for row in expected if row["speech"] == ""]
    assert [row["t"] for row in boundary_rows] == [0.0, 1.5, 3.0]
    # Terminal row carries the last segment's end.
    assert expected[-1]["t"] == 3.0
