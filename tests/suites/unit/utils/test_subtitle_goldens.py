"""Byte-exact subtitle golden files (format rules are the parity contract)."""

from pathlib import Path

import pytest

from ser_tpu._internal.utils.subtitles import (
    _render,
    save_timeline_to_subtitles,
    timeline_to_subtitle_cues,
)
from ser_tpu.domain import TimelineEntry

GOLDEN_DIR = Path(__file__).resolve().parents[3] / "fixtures/subtitles"


def _timeline():
    return [
        TimelineEntry(0.0, "happy", "hello there"),
        TimelineEntry(1.25, "happy", ""),  # no speech → no cue, but bounds prior
        TimelineEntry(2.5, "sad", "goodbye, friend"),
        TimelineEntry(3.985, "neutral", "last words"),
    ]


@pytest.mark.parametrize("fmt", ("ass", "srt", "vtt"))
def test_rendered_output_matches_golden(fmt):
    cues = timeline_to_subtitle_cues(_timeline())
    golden = (GOLDEN_DIR / f"golden.{fmt}").read_text(encoding="utf-8")
    assert _render(cues, fmt) == golden


@pytest.mark.parametrize("fmt", ("ass", "srt", "vtt"))
def test_saved_file_matches_golden(tmp_path, fmt):
    out = tmp_path / f"clip.{fmt}"
    save_timeline_to_subtitles(
        _timeline(), "clip.wav", subtitle_format=fmt, output_path=str(out)
    )
    golden = (GOLDEN_DIR / f"golden.{fmt}").read_text(encoding="utf-8")
    assert out.read_text(encoding="utf-8") == golden


def test_cue_timing_contract():
    cues = timeline_to_subtitle_cues(_timeline())
    assert [(c.start_seconds, c.end_seconds) for c in cues] == [
        (0.0, 1.25),  # bounded by the next (speechless) row
        (2.5, 3.985),
        (3.985, pytest.approx(4.985)),  # last row: default 1 s duration
    ]
    assert all("(" in _render([c], "srt") for c in cues)  # emotion suffix present
