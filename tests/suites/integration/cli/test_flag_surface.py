"""CLI flag-surface parity tests for the top-level parser.

Parity surface: reference ``ser/__main__.py:177-285`` — canonical flag names,
aliases, defaults, and the dataset recipe/audit override semantics.
"""

import pytest

import ser_tpu.__main__ as cli
from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs


def _parse(argv):
    return cli.build_parser().parse_args(argv)


def _settings(**env):
    return build_settings_from_inputs(capture_settings_inputs(env=env))


class TestFlagAliases:
    def test_no_timeout_alias(self):
        """--no-timeout aliases --disable-timeouts (reference __main__.py:234-238)."""
        assert _parse(["--no-timeout"]).disable_timeouts is True
        assert _parse(["--disable-timeouts"]).disable_timeouts is True
        assert _parse([]).disable_timeouts is False

    def test_subtitle_output_is_canonical_with_path_alias(self):
        """--subtitle-output is the reference's flag name (__main__.py:201);
        --subtitle-path is kept as a compatibility alias."""
        assert _parse(["--subtitle-output", "out.srt"]).subtitle_path == "out.srt"
        assert _parse(["--subtitle-path", "out.srt"]).subtitle_path == "out.srt"


class TestStrictDatasetAudit:
    def test_tri_state_parse(self):
        assert _parse([]).strict_dataset_audit is None
        assert _parse(["--strict-dataset-audit"]).strict_dataset_audit is True
        assert _parse(["--no-strict-dataset-audit"]).strict_dataset_audit is False

    def test_override_application(self):
        """Reference __main__.py:296-308: explicit flag wins; a CLI recipe
        implies strict auditing unless explicitly relaxed."""
        settings = _settings()

        untouched = cli._apply_dataset_recipe_override(settings, _parse([]))
        assert untouched is settings

        strict = cli._apply_dataset_recipe_override(
            settings, _parse(["--strict-dataset-audit"])
        )
        assert strict.dataset.strict_audit is True

        recipe_implies = cli._apply_dataset_recipe_override(
            settings, _parse(["--dataset-recipe", "research-v1"])
        )
        assert recipe_implies.dataset.recipe == "research-v1"
        assert recipe_implies.dataset.strict_audit is True

        relaxed = cli._apply_dataset_recipe_override(
            settings,
            _parse(["--dataset-recipe", "research-v1", "--no-strict-dataset-audit"]),
        )
        assert relaxed.dataset.recipe == "research-v1"
        assert relaxed.dataset.strict_audit is False


class TestCalibrationFlags:
    def test_reference_defaults(self):
        """Defaults match reference __main__.py:273-285."""
        args = _parse(["--calibrate-transcription-runtime"])
        assert args.calibration_iterations == 2
        assert args.calibration_profiles == "accurate,medium,accurate-research,fast"

    @pytest.mark.parametrize(
        "argv",
        [
            ["--calibrate-transcription-runtime", "--calibration-iterations", "0"],
            ["--calibrate-transcription-runtime", "--calibration-profiles", "turbo"],
            ["--calibrate-transcription-runtime", "--calibration-profiles", " , "],
        ],
    )
    def test_invalid_calibration_inputs_exit_validation(self, argv, monkeypatch):
        """Bad knob values exit 2 before any dataset/backend work
        (reference commands.py:232-234)."""
        monkeypatch.setenv("SER_DATASET_FOLDER", "/nonexistent-calibration-corpus")
        assert cli.main(argv) == 2


class TestDoctorFlags:
    def test_reference_flag_names_parse(self):
        """doctor --profile/--format/--strict/--include-noise-findings/
        --skip-transcription-checks (reference diagnostics/command.py:33-57)."""
        args = _parse([
            "doctor", "--profile", "fast", "--format", "json", "--strict",
            "--include-noise-findings", "--skip-transcription-checks",
        ])
        assert args.profile == "fast"
        assert args.style == "json"
        assert args.strict is True
        assert args.include_noise_findings is True
        assert args.no_transcription_checks is True

    def test_style_alias_still_parses(self):
        assert _parse(["doctor", "--style", "brief"]).style == "brief"

    def test_doctor_runs_with_noise_findings(self, capsys, monkeypatch, tmp_path):
        monkeypatch.setenv("SER_TMP_FOLDER", str(tmp_path / "tmp"))
        monkeypatch.setenv("SER_MODELS_FOLDER", str(tmp_path / "models"))
        code = cli.main([
            "doctor", "--format", "json", "--include-noise-findings",
            "--skip-transcription-checks",
        ])
        out = capsys.readouterr().out
        assert code in (0, 1)
        import json

        payload = json.loads(out)
        codes = [f["code"] for f in payload["findings"]]
        assert "environment.jax" in codes


class TestGateFlags:
    def test_reference_knob_names_parse(self):
        """gate --n-splits/--out aliases + threshold overrides
        (reference quality_gate_cli.py:54,106-131)."""
        args = _parse([
            "gate", "--n-splits", "5", "--out", "r.json",
            "--min-uar-delta", "0.01", "--min-macro-f1-delta", "0.02",
            "--max-medium-segments-per-minute", "30",
            "--min-medium-median-segment-duration", "1.5",
        ])
        assert args.folds == 5
        assert str(args.output) == "r.json"
        assert args.min_uar_delta == 0.01
        assert args.min_macro_f1_delta == 0.02
        assert args.max_medium_segments_per_minute == 30.0
        assert args.min_medium_median_segment_duration == 1.5
