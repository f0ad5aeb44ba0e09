"""Differential parity: subtitle cue building, rendering, export resolution.

Reference stage: ``ser/_internal/utils/subtitles.py:38-199`` — cue timing
(next-row end or default 1 s duration), byte-exact ASS/SRT/VTT rendering
(headers, centisecond/millisecond rounding), and export-request validation.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reference_oracle import OracleRemoteError
from ser_tpu._internal.config.schema import TimelineConfig
from ser_tpu._internal.utils.subtitles import (
    resolve_subtitle_export_request,
    save_timeline_to_subtitles,
    timeline_to_subtitle_cues,
)
from ser_tpu.domain import TimelineEntry

FORMATS = ("ass", "srt", "vtt")

timestamps = st.floats(min_value=0.0, max_value=4000.0, allow_nan=False, allow_infinity=False)


@st.composite
def timelines(draw) -> list[tuple[float, str, str]]:
    count = draw(st.integers(min_value=0, max_value=12))
    rows = []
    for _ in range(count):
        rows.append(
            (
                draw(timestamps),
                draw(st.sampled_from(["happy", "sad", "", "neutral"])),
                draw(
                    st.sampled_from(
                        ["hello world", "", "  spaced  ", "line\nbreak", "carriage\rreturn", "word"]
                    )
                ),
            )
        )
    return rows


@settings(max_examples=100, deadline=None)
@given(timeline=timelines(), duration=st.sampled_from([0.5, 1.0, 2.5]))
def test_subtitle_cues_parity(oracle, timeline, duration):
    reference = oracle.call(
        "subtitle_cues", timeline=timeline, default_duration_seconds=duration
    )
    repo = timeline_to_subtitle_cues(
        [TimelineEntry(*row) for row in timeline], default_duration_seconds=duration
    )
    assert [
        (cue.start_seconds, cue.end_seconds, cue.text, cue.emotion) for cue in repo
    ] == reference


@settings(max_examples=60, deadline=None)
@given(timeline=timelines(), subtitle_format=st.sampled_from(FORMATS))
def test_subtitle_render_byte_parity(oracle, tmp_path_factory, timeline, subtitle_format):
    reference = oracle.call(
        "subtitles_render",
        timeline=timeline,
        file_name="clip.wav",
        subtitle_format=subtitle_format,
    )
    out_dir = tmp_path_factory.mktemp("subs")
    path = save_timeline_to_subtitles(
        [TimelineEntry(*row) for row in timeline],
        "clip.wav",
        subtitle_format=subtitle_format,
        timeline_config=TimelineConfig(folder=out_dir),
    )
    with open(path, encoding="utf-8") as handle:
        text = handle.read()
    assert path.endswith(reference["name"].split("clip")[-1])
    assert text == reference["text"]


@pytest.mark.parametrize(
    ("output_path", "subtitle_format"),
    [
        (None, None),
        (None, "srt"),
        ("out.vtt", None),
        ("out.srt", "ass"),
        ("captions/out.ass", None),
        ("out.SRT", None),
        ("out.txt", "vtt"),
        ("  padded.vtt  ", None),
    ],
)
def test_subtitle_request_resolution_parity(oracle, output_path, subtitle_format):
    reference = oracle.call(
        "subtitle_request", output_path=output_path, subtitle_format=subtitle_format
    )
    repo = resolve_subtitle_export_request(
        output_path=output_path, subtitle_format=subtitle_format
    )
    assert repo == (tuple(reference) if reference is not None else None)


@pytest.mark.parametrize(
    ("output_path", "subtitle_format"),
    [("", None), ("   ", None), ("out.txt", None), (None, "mkv")],
)
def test_subtitle_request_error_parity(oracle, output_path, subtitle_format):
    with pytest.raises(OracleRemoteError) as reference_error:
        oracle.call(
            "subtitle_request", output_path=output_path, subtitle_format=subtitle_format
        )
    with pytest.raises(ValueError):
        resolve_subtitle_export_request(
            output_path=output_path, subtitle_format=subtitle_format
        )
    assert reference_error.value.error_type == "ValueError"
