"""Calibration workflow: stratified subsets, matrix, gate, runtime ladder."""

import json
from pathlib import Path

import pytest

from ser_tpu._internal.transcript import calibration as cal
from ser_tpu.domain import TranscriptWord


def _ravdess_name(actor: str, statement: str, emotion: str = "05") -> Path:
    return Path(f"03-01-{emotion}-01-{statement}-01-{actor}.wav")


class TestReferenceSelection:
    def test_reference_text_from_statement_code(self):
        assert cal.ravdess_reference_text(_ravdess_name("01", "01")) == (
            "kids are talking by the door"
        )
        assert cal.ravdess_reference_text(_ravdess_name("01", "02")) == (
            "dogs are sitting by the door"
        )
        assert cal.ravdess_reference_text(Path("clip.wav")) is None

    def test_metadata_parsing(self):
        metadata = cal.parse_ravdess_metadata(_ravdess_name("07", "02", emotion="03"))
        assert metadata == cal.RavdessMetadata(
            emotion_code="03", statement_code="02", actor_id="07"
        )
        assert cal.parse_ravdess_metadata(Path("short-name.wav")) is None

    def test_stratified_subset_covers_strata_near_uniformly(self):
        # 4 actors x 2 statements x 3 clips = 24 files; limit 8 must cover
        # every (actor, statement) stratum exactly once.
        files = [
            Path(f"03-01-05-01-{statement}-0{rep}-{actor}.wav")
            for actor in ("01", "02", "03", "04")
            for statement in ("01", "02")
            for rep in (1, 2, 3)
        ]
        subset = cal.stratified_reference_subset(files, limit=8, random_seed=7)
        assert len(subset) == 8
        strata = {(cal.parse_ravdess_metadata(f).actor_id, cal.parse_ravdess_metadata(f).statement_code) for f in subset}
        assert len(strata) == 8
        # Deterministic for a fixed seed.
        assert subset == cal.stratified_reference_subset(files, limit=8, random_seed=7)

    def test_subset_degenerate_cases(self):
        files = [_ravdess_name("01", "01"), _ravdess_name("02", "02")]
        assert cal.stratified_reference_subset(files, limit=10) == files
        unparseable = [Path("a.wav"), Path("b.wav"), Path("c.wav")]
        assert cal.stratified_reference_subset(unparseable, limit=2) == unparseable[:2]

    def test_coverage_summary(self):
        files = [_ravdess_name("01", "01"), _ravdess_name("02", "01", emotion="03")]
        assert cal.summarize_subset_coverage(files) == {
            "actors": 2,
            "emotions": 2,
            "statements": 1,
        }

    def test_collect_reference_samples_filters_and_pairs(self):
        files = [str(_ravdess_name("01", "01")), "not-ravdess.wav", str(_ravdess_name("02", "02"))]
        samples = cal.collect_reference_samples(files)
        assert len(samples) == 2
        assert samples[0][1] in cal.STATEMENT_TEXT.values()
        with pytest.raises(ValueError):
            cal.collect_reference_samples(files, limit=0)
        with pytest.raises(ValueError, match="sampling_strategy"):
            cal.collect_reference_samples(files, limit=1, sampling_strategy="bogus")

    def test_profile_csv_normalization(self):
        assert cal.normalize_calibration_profile_csv("fast, accurate,fast") == (
            "fast",
            "accurate",
        )
        with pytest.raises(ValueError, match="turbo"):
            cal.normalize_calibration_profile_csv("fast,turbo")
        with pytest.raises(ValueError):
            cal.normalize_calibration_profile_csv(" , ")


def _words(text: str) -> list[TranscriptWord]:
    return [TranscriptWord(word=w, start_seconds=0.0, end_seconds=0.1) for w in text.split()]


class TestCandidateMatrix:
    def test_matrix_entry_latency_and_wer(self):
        samples = [(str(_ravdess_name("01", "01")), "kids are talking by the door")] * 4

        def transcribe(_path):
            return _words("kids are talking by the door")

        entry = cal.profile_candidate_matrix(
            transcribe, samples, backend_id="jax_whisper", model_name="tiny"
        )
        assert entry.mean_wer == 0.0
        assert entry.evaluated_samples == 4
        assert entry.latency.p50 <= entry.latency.p95 <= entry.latency.maximum
        assert entry.mean_accuracy == 1.0

    def test_per_sample_failures_counted_not_fatal(self):
        samples = [
            (str(_ravdess_name("01", "01")), "kids are talking by the door"),
            ("corrupt.wav", "kids are talking by the door"),
            (str(_ravdess_name("02", "01")), "kids are talking by the door"),
        ]
        calls = {"n": 0}

        def transcribe(path):
            calls["n"] += 1
            if path == "corrupt.wav":
                raise OSError("truncated WAV")
            return _words("kids are talking by the door")

        entry = cal.profile_candidate_matrix(
            transcribe, samples, backend_id="jax_whisper", model_name="tiny"
        )
        assert entry.failed_samples == 1
        assert entry.evaluated_samples == 2
        assert entry.error_message is None  # some samples succeeded

    def test_all_samples_failing_yields_error_entry(self):
        calls = {"n": 0}

        def transcribe(_path):
            calls["n"] += 1
            if calls["n"] > 1:  # warmup succeeds, every timed run dies
                raise OSError("device gone")
            return _words("kids are talking by the door")

        entry = cal.profile_candidate_matrix(
            transcribe,
            [("a.wav", "kids are talking by the door")],
            backend_id="jax_whisper",
            model_name="tiny",
        )
        assert entry.evaluated_samples == 0
        assert entry.mean_wer == 1.0
        assert "device gone" in entry.error_message

    def test_warmup_setup_failure_is_recorded_not_fatal(self):
        # A backend that cannot even warm up (or a corrupt FIRST clip) must
        # surface in the report as the candidate's error entry — other
        # candidates in the same run still profile.
        def transcribe(_path):
            raise RuntimeError("Whisper assets missing")

        entry = cal.profile_candidate_matrix(
            transcribe,
            [("a.wav", "kids are talking by the door")],
            backend_id="jax_whisper",
            model_name="tiny",
        )
        assert entry.evaluated_samples == 0
        assert entry.failed_samples == 1
        assert "warmup" in entry.error_message
        assert "assets missing" in entry.error_message


def _entry(name: str, wer: float, mean_latency: float, samples: int = 5, error=None):
    lat = cal.LatencyPercentiles(
        mean=mean_latency,
        p10=mean_latency,
        p50=mean_latency,
        p90=mean_latency,
        p95=mean_latency,
        minimum=mean_latency,
        maximum=mean_latency,
    )
    return cal.CandidateMatrixEntry(
        backend_id="jax_whisper",
        model_name=name,
        mean_wer=wer,
        latency=lat,
        evaluated_samples=samples,
        failed_samples=0,
        error_message=error,
    )


class TestRecommendation:
    def test_gate_is_baseline_minus_drop_with_floor(self):
        gate = cal.derive_accuracy_gate(
            _entry("large", wer=0.10, mean_latency=4.0),
            absolute_accuracy_floor=0.70,
            maximum_accuracy_drop=0.05,
        )
        assert gate.minimum_mean_accuracy == pytest.approx(0.85)
        floor_gate = cal.derive_accuracy_gate(
            _entry("large", wer=0.40, mean_latency=4.0),
            absolute_accuracy_floor=0.70,
            maximum_accuracy_drop=0.05,
        )
        assert floor_gate.minimum_mean_accuracy == pytest.approx(0.70)

    def test_faster_gate_clearing_candidate_wins(self):
        baseline = _entry("large-v3", wer=0.05, mean_latency=4.0)
        candidate = _entry("distil-large-v3", wer=0.08, mean_latency=2.0)
        gate = cal.derive_accuracy_gate(baseline)
        outcome = cal.recommend_default_candidate([baseline, candidate], gate)
        assert outcome.changed and outcome.recommended_name == "distil-large-v3"
        assert outcome.speedup_ratio == pytest.approx(2.0)

    def test_accuracy_gate_blocks_fast_but_sloppy_candidate(self):
        baseline = _entry("large-v3", wer=0.05, mean_latency=4.0)
        sloppy = _entry("tiny", wer=0.30, mean_latency=0.5)
        gate = cal.derive_accuracy_gate(baseline)
        outcome = cal.recommend_default_candidate([baseline, sloppy], gate)
        assert not outcome.changed and outcome.recommended_name == "large-v3"

    def test_insufficient_speedup_keeps_baseline(self):
        baseline = _entry("large-v3", wer=0.05, mean_latency=4.0)
        candidate = _entry("turbo", wer=0.05, mean_latency=3.6)  # 1.11x < 1.25x
        outcome = cal.recommend_default_candidate(
            [baseline, candidate], cal.derive_accuracy_gate(baseline)
        )
        assert not outcome.changed

    def test_small_sample_size_refuses_changes(self):
        baseline = _entry("large-v3", wer=0.05, mean_latency=4.0, samples=2)
        candidate = _entry("turbo", wer=0.05, mean_latency=1.0)
        outcome = cal.recommend_default_candidate(
            [baseline, candidate], cal.derive_accuracy_gate(baseline)
        )
        assert not outcome.changed and "sample size" in outcome.reason.lower()

    def test_errored_candidates_never_win(self):
        baseline = _entry("large-v3", wer=0.05, mean_latency=4.0)
        broken = _entry("turbo", wer=0.0, mean_latency=0.1, samples=0, error="OOM")
        outcome = cal.recommend_default_candidate(
            [baseline, broken], cal.derive_accuracy_gate(baseline)
        )
        assert not outcome.changed


def _stats(**overrides):
    defaults = dict(
        iterations=3,
        successful_runs=3,
        failed_runs=0,
        tpu_loaded_runs=3,
        tpu_completed_runs=3,
        tpu_to_cpu_failover_runs=0,
        hard_tpu_oom_runs=0,
        mean_latency_seconds=1.0,
        error_messages=(),
    )
    defaults.update(overrides)
    return cal.RuntimeCalibrationProbeStats(**defaults)


class TestRuntimeLadder:
    def test_stable_runs_prefer_tpu_high_confidence(self):
        assert cal.derive_runtime_recommendation(_stats()) == (
            "prefer_tpu",
            "high",
            "TPU runs remained stable across calibration.",
        )

    def test_hard_oom_prefers_cpu(self):
        rec, confidence, reason = cal.derive_runtime_recommendation(
            _stats(hard_tpu_oom_runs=2, failed_runs=2, successful_runs=1)
        )
        assert rec == "prefer_cpu" and confidence == "high" and "OOM" in reason

    def test_never_admitted_prefers_cpu(self):
        rec, confidence, _ = cal.derive_runtime_recommendation(
            _stats(tpu_loaded_runs=0, tpu_completed_runs=0)
        )
        assert rec == "prefer_cpu" and confidence == "high"

    def test_mixed_stability_with_failover(self):
        rec, confidence, _ = cal.derive_runtime_recommendation(
            _stats(tpu_completed_runs=2, tpu_to_cpu_failover_runs=1)
        )
        assert rec == "tpu_with_failover" and confidence == "medium"

    def test_zero_iterations(self):
        assert cal.derive_runtime_recommendation(_stats(iterations=0))[0] == "prefer_cpu"

    def test_probe_accounting_counts_failover_and_oom(self):
        devices = iter(["tpu", "tpu", "tpu", "cpu", "tpu", "tpu"])  # before/after pairs
        outcomes = iter(["ok", "ok", "oom"])

        class FakeModel:
            pass

        def transcribe(_model, _path):
            outcome = next(outcomes)
            if outcome == "oom":
                raise RuntimeError("RESOURCE_EXHAUSTED: Out of memory allocating 2.5G")

        stats = cal.run_runtime_calibration_probes(
            calibration_file="clip.wav",
            iterations=3,
            load_model=FakeModel,
            transcribe=transcribe,
            device_of=lambda _m: next(devices),
        )
        assert stats.successful_runs == 2 and stats.failed_runs == 1
        assert stats.tpu_loaded_runs == 3
        assert stats.tpu_completed_runs == 1
        assert stats.tpu_to_cpu_failover_runs == 1
        assert stats.hard_tpu_oom_runs == 1


class TestReportAndAdmission:
    def test_report_build_carries_matrix_gate_and_runtime(self, tmp_path):
        baseline = _entry("large-v3", wer=0.05, mean_latency=4.0)
        candidate = _entry("distil-large-v3", wer=0.07, mean_latency=2.0)
        payload = cal.build_calibration_report(
            [baseline, candidate], runtime_stats=_stats(), now=lambda: 1000.0
        )
        assert payload["version"] == cal.CALIBRATION_REPORT_VERSION
        assert len(payload["candidate_matrix"]) == 2
        assert payload["default_selection"]["changed"] is True
        assert payload["runtime"]["recommendation"] == "prefer_tpu"
        # v1-compatible recommendation key intact.
        assert payload["recommendation"]["model_name"] in ("large-v3", "distil-large-v3")

    def test_v2_report_feeds_admission_override(self, tmp_path):
        """The full coupling: calibration writes → admission override reads."""
        from ser_tpu._internal.config.schema import TranscriptionConfig
        from ser_tpu._internal.transcript.hbm_admission import (
            calibration_admission_override,
        )

        baseline = _entry("distil-large-v3", wer=0.05, mean_latency=2.0)
        payload = cal.build_calibration_report([baseline])
        report_path = tmp_path / "calibration.json"
        cal.save_calibration_report_v2(payload, report_path)

        config = TranscriptionConfig(
            calibration_overrides_enabled=True,
            calibration_report_path=str(report_path),
            calibration_min_confidence="medium",
        )
        reason = calibration_admission_override("distil-large-v3", config)
        assert reason is not None and "distil-large-v3" in reason
        # A different model than the one calibrated gets no override.
        assert calibration_admission_override("tiny", config) is None

    def test_degraded_report_confidence_blocks_override(self, tmp_path):
        from ser_tpu._internal.config.schema import TranscriptionConfig
        from ser_tpu._internal.transcript.hbm_admission import (
            calibration_admission_override,
        )

        # A no-candidate-cleared-the-gate report carries low confidence.
        bad = _entry("tiny", wer=0.60, mean_latency=1.0)
        payload = cal.build_calibration_report([bad])
        assert payload["recommendation"]["confidence"] == "low"
        report_path = tmp_path / "calibration.json"
        cal.save_calibration_report_v2(payload, report_path)
        config = TranscriptionConfig(
            calibration_overrides_enabled=True,
            calibration_report_path=str(report_path),
            calibration_min_confidence="medium",
        )
        assert calibration_admission_override("tiny", config) is None

    def test_stale_report_blocks_override(self, tmp_path):
        from ser_tpu._internal.config.schema import TranscriptionConfig
        from ser_tpu._internal.transcript.hbm_admission import (
            calibration_admission_override,
        )

        baseline = _entry("distil-large-v3", wer=0.05, mean_latency=2.0)
        payload = cal.build_calibration_report([baseline], now=lambda: 1000.0)  # 1970
        report_path = tmp_path / "calibration.json"
        cal.save_calibration_report_v2(payload, report_path)
        config = TranscriptionConfig(
            calibration_overrides_enabled=True,
            calibration_report_path=str(report_path),
            calibration_min_confidence="low",
        )
        assert calibration_admission_override("distil-large-v3", config) is None

    def test_report_is_valid_json_on_disk(self, tmp_path):
        payload = cal.build_calibration_report([_entry("tiny", wer=0.1, mean_latency=1.0)])
        path = cal.save_calibration_report_v2(payload, tmp_path / "r.json")
        loaded = json.loads(Path(path).read_text())
        assert loaded["accuracy_gate"]["minimum_mean_accuracy"] >= 0.70


class TestCalibrationIterations:
    def test_iterations_widen_latency_matrix_only(self):
        """--calibration-iterations repeats timed runs; WER stays single-pass
        (reference commands.py:223-238 iterations_per_profile)."""
        samples = [(str(_ravdess_name("01", "01")), "kids are talking by the door")] * 3
        calls = {"n": 0}

        def transcribe(_path):
            calls["n"] += 1
            return _words("kids are talking by the door")

        entry = cal.profile_candidate_matrix(
            transcribe, samples, backend_id="jax_whisper", model_name="tiny",
            iterations=3,
        )
        # 1 warmup + 3 iterations x 3 samples
        assert calls["n"] == 1 + 9
        assert entry.evaluated_samples == 3  # WER samples: first pass only
        assert entry.latency.maximum >= entry.latency.p50 >= entry.latency.minimum

    def test_non_positive_iterations_rejected(self):
        samples = [(str(_ravdess_name("01", "01")), "kids are talking by the door")]
        with pytest.raises(ValueError, match="positive"):
            cal.profile_candidate_matrix(
                lambda p: _words("kids"), samples,
                backend_id="jax_whisper", model_name="tiny", iterations=0,
            )

    def test_parse_calibration_profiles_alias(self):
        assert cal.parse_calibration_profiles("fast, accurate,fast") == (
            "fast",
            "accurate",
        )
