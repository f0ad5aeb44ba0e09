"""Differential parity: quality-gate stability math and gate decision.

Reference stages: ``ser/_internal/runtime/quality_gate_evaluation.py:96-132``
(duration-weighted clip label, per-clip stability metrics) and
``quality_gate_policy.py:89-142`` (threshold comparison / pass-fail). The
decision bit and the deltas must match exactly; reason STRINGS are this
repo's own wording (not a parity surface — they are log prose, not data).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ser_tpu._internal.config.schema import QualityGateConfig
from ser_tpu._internal.runtime.quality_gate import (
    ProfileEvaluation,
    TemporalStability,
    clip_stability_metrics,
    decide_quality_gate,
    duration_weighted_clip_label,
    temporal_stability_of,
)
from ser_tpu.runtime.schema import SegmentPrediction

EMOTIONS = ["angry", "calm", "happy", "sad"]


@st.composite
def segment_lists(draw) -> list[dict]:
    count = draw(st.integers(min_value=0, max_value=12))
    segments = []
    cursor = draw(st.floats(min_value=0.0, max_value=5.0, allow_nan=False))
    for _ in range(count):
        length = draw(
            st.sampled_from([0.0, 0.25, 1.0, 3.5])
        )  # include zero-length segments (vote floor path)
        segments.append(
            {
                "emotion": draw(st.sampled_from(EMOTIONS)),
                "start_seconds": cursor,
                "end_seconds": cursor + length,
            }
        )
        cursor += length + draw(st.sampled_from([0.0, 0.5]))
    return segments


def _segments(payload: list[dict]) -> list[SegmentPrediction]:
    return [
        SegmentPrediction(confidence=1.0, **item) for item in payload
    ]


@settings(max_examples=120, deadline=None)
@given(payload=segment_lists())
def test_clip_stability_metrics_parity(oracle, payload):
    rate, durations = clip_stability_metrics(_segments(payload))
    theirs = oracle.call("clip_stability", segments=payload)
    assert rate == theirs["rate"]
    assert durations == theirs["durations"]


@settings(max_examples=120, deadline=None)
@given(payload=segment_lists())
def test_duration_weighted_clip_label_parity(oracle, payload):
    ours = duration_weighted_clip_label(_segments(payload), unknown_label="unknown")
    theirs = oracle.call("clip_label", segments=payload, unknown_label="unknown")
    assert ours == theirs


@settings(max_examples=120, deadline=None)
@given(
    fast_uar=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    medium_uar=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    fast_f1=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    medium_f1=st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    rate=st.floats(min_value=0.0, max_value=60.0, allow_nan=False),
    duration=st.floats(min_value=0.0, max_value=30.0, allow_nan=False),
    min_uar_delta=st.sampled_from([0.0, 0.0025, 0.05]),
    min_f1_delta=st.sampled_from([0.0, 0.0025, 0.05]),
    max_rate=st.sampled_from([10.0, 25.0]),
    min_duration=st.sampled_from([0.0, 2.5]),
)
def test_gate_decision_parity(
    oracle,
    fast_uar,
    medium_uar,
    fast_f1,
    medium_f1,
    rate,
    duration,
    min_uar_delta,
    min_f1_delta,
    max_rate,
    min_duration,
):
    config = QualityGateConfig(
        min_uar_delta=min_uar_delta,
        min_macro_f1_delta=min_f1_delta,
        max_medium_segments_per_minute=max_rate,
        min_medium_median_segment_duration_seconds=min_duration,
    )
    decision = decide_quality_gate(
        baseline=ProfileEvaluation("fast", fast_uar, fast_f1, 5),
        candidate=ProfileEvaluation("medium", medium_uar, medium_f1, 5),
        candidate_stability=TemporalStability(rate, duration),
        config=config,
    )
    theirs = oracle.call(
        "compare_profiles",
        fast_metrics={"uar": fast_uar, "macro_f1": fast_f1},
        medium_metrics={"uar": medium_uar, "macro_f1": medium_f1},
        fast_stability={
            "segment_count_per_minute": 0.0,
            "median_segment_duration_seconds": 0.0,
        },
        medium_stability={
            "segment_count_per_minute": rate,
            "median_segment_duration_seconds": duration,
        },
        thresholds={
            "minimum_uar_delta": min_uar_delta,
            "minimum_macro_f1_delta": min_f1_delta,
            "maximum_medium_segments_per_minute": max_rate,
            "minimum_medium_median_segment_duration_seconds": min_duration,
        },
    )
    assert decision.promote == theirs["passes"]
    # Our decision appends a success line when promoting; failure reasons
    # must agree in count.
    failures = 0 if decision.promote else len(decision.reasons)
    assert failures == theirs["failure_count"]


def test_temporal_stability_is_mean_of_clip_rates(oracle):
    # Two clips: 2 segments / 30 s and 6 segments / 60 s — pooled ratio would
    # be 8/1.5 = 5.33/min; the reference averages per-clip rates: (4+6)/2.
    clip_a = [
        {"emotion": "calm", "start_seconds": 0.0, "end_seconds": 15.0},
        {"emotion": "sad", "start_seconds": 15.0, "end_seconds": 30.0},
    ]
    clip_b = [
        {
            "emotion": "calm",
            "start_seconds": 10.0 * index,
            "end_seconds": 10.0 * (index + 1),
        }
        for index in range(6)
    ]
    stability = temporal_stability_of([_segments(clip_a), _segments(clip_b)])
    rate_a = oracle.call("clip_stability", segments=clip_a)["rate"]
    rate_b = oracle.call("clip_stability", segments=clip_b)["rate"]
    assert stability.segments_per_minute == (rate_a + rate_b) / 2 == 5.0
