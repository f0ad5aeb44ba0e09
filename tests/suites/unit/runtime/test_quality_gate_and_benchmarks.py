"""Quality gate + latency harness + admission + env plan tests."""

import numpy as np
import pytest

from ser_tpu._internal.config.schema import QualityGateConfig, TranscriptionConfig
from ser_tpu._internal.runtime.benchmarks import run_latency_benchmark
from ser_tpu._internal.runtime.quality_gate import (
    ProfileEvaluation,
    TemporalStability,
    decide_quality_gate,
    temporal_stability_of,
)
from ser_tpu.runtime.schema import SegmentPrediction


def _eval(profile, uar, f1):
    return ProfileEvaluation(profile=profile, uar=uar, macro_f1=f1, folds=4)


def test_gate_promotes_when_thresholds_met():
    decision = decide_quality_gate(
        baseline=_eval("fast", 0.70, 0.68),
        candidate=_eval("medium", 0.75, 0.73),
        candidate_stability=TemporalStability(10.0, 3.0),
        config=QualityGateConfig(),
    )
    assert decision.promote
    assert "All promotion thresholds met." in decision.reasons


def test_gate_blocks_on_uar_regression():
    decision = decide_quality_gate(
        baseline=_eval("fast", 0.75, 0.75),
        candidate=_eval("medium", 0.74, 0.80),
        config=QualityGateConfig(),
    )
    assert not decision.promote
    assert any("UAR delta" in reason for reason in decision.reasons)


def test_gate_blocks_on_segment_churn():
    decision = decide_quality_gate(
        baseline=_eval("fast", 0.70, 0.70),
        candidate=_eval("medium", 0.80, 0.80),
        candidate_stability=TemporalStability(40.0, 1.0),
        config=QualityGateConfig(),
    )
    assert not decision.promote
    assert any("segments/min" in reason for reason in decision.reasons)
    assert any("Median segment" in reason for reason in decision.reasons)


def test_temporal_stability_computation():
    segments = [
        [
            SegmentPrediction("a", 0.0, 30.0, 0.9),
            SegmentPrediction("b", 30.0, 60.0, 0.9),
        ]
    ]
    stability = temporal_stability_of(segments)
    assert stability.segments_per_minute == pytest.approx(2.0)
    assert stability.median_segment_duration_seconds == pytest.approx(30.0)


def test_latency_benchmark_stats():
    calls = []
    report = run_latency_benchmark(lambda: calls.append(1), runs=5, warmup_runs=2)
    assert len(calls) == 7  # warmup + timed
    assert report.runs == 5
    assert report.min_seconds <= report.median_seconds <= report.max_seconds


def test_word_error_rate():
    from ser_tpu._internal.transcript.profiling import word_error_rate

    assert word_error_rate("kids are talking by the door", "kids are talking by the door") == 0.0
    assert word_error_rate("kids are talking", "kids are walking") == pytest.approx(1 / 3)
    assert word_error_rate("a b c", "") == 1.0
    assert word_error_rate("", "something") == 1.0
    # Case/punctuation insensitive.
    assert word_error_rate("Kids are Talking!", "kids are talking") == 0.0


def test_calibration_recommendation():
    from ser_tpu._internal.transcript.profiling import (
        TranscriptionCandidateReport,
        recommend_default,
    )

    fast_ok = TranscriptionCandidateReport("jax_whisper", "small", 0.10, 1.0, 2.0, 4)
    slow_better = TranscriptionCandidateReport("jax_whisper", "large", 0.05, 4.0, 6.0, 4)
    rec = recommend_default([fast_ok, slow_better])
    assert rec.model_name == "small"  # fastest that clears the WER gate
    assert rec.confidence == "high"
    bad = TranscriptionCandidateReport("jax_whisper", "tiny", 0.9, 0.5, 1.0, 4)
    rec2 = recommend_default([bad])
    assert rec2.confidence == "low"


def test_hbm_admission_decisions():
    from ser_tpu._internal.transcript.hbm_admission import (
        admit_transcription_model,
        estimate_model_footprint_mb,
    )

    assert estimate_model_footprint_mb("tiny") < estimate_model_footprint_mb("large-v3")
    decision = admit_transcription_model(
        "large-v3", config=TranscriptionConfig(hbm_admission_control_enabled=False)
    )
    assert decision.admitted and "disabled" in decision.reason


def test_environment_plan_scoping():
    import os

    from ser_tpu._internal.runtime.environment_plan import (
        RuntimeEnvironmentPlan,
        temporary_process_env,
    )

    os.environ.pop("SER_TEST_PLAN_VAR", None)
    plan = RuntimeEnvironmentPlan(set_vars={"SER_TEST_PLAN_VAR": "on"})
    with temporary_process_env(plan):
        assert os.environ["SER_TEST_PLAN_VAR"] == "on"
    assert "SER_TEST_PLAN_VAR" not in os.environ


def test_latency_p95_is_nearest_rank_not_interpolated():
    # Reference benchmarks.py:43-47: with 5 runs p95 lands on the max sample
    # (round(0.95*4)=4); an interpolated percentile would report less.
    from ser_tpu._internal.runtime.benchmarks import run_latency_benchmark

    durations = iter([0.010, 0.020, 0.030, 0.040, 0.100])
    import time as _time

    real = _time.perf_counter
    state = {"now": 0.0, "pending": None}

    def fake_counter():
        if state["pending"] is None:
            state["pending"] = next(durations, 0.0)
            return state["now"]
        state["now"] += state["pending"]
        state["pending"] = None
        return state["now"]

    _time.perf_counter = fake_counter
    try:
        report = run_latency_benchmark(lambda: None, runs=5, warmup_runs=0)
    finally:
        _time.perf_counter = real
    assert report.p95_seconds == report.max_seconds == 0.100
    assert report.min_seconds == 0.010
