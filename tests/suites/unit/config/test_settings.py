"""Settings capture/build/override tests (reference bootstrap + builder semantics)."""

import dataclasses
from pathlib import Path

import pytest

from ser_tpu._internal.config.settings_builder import RAVDESS_EMOTIONS, build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import (
    SettingsInputError,
    capture_settings_inputs,
    read_env_bool,
)
from ser_tpu.config import get_settings, reload_settings, settings_override


def test_default_settings_have_ravdess_emotions():
    settings = build_settings_from_inputs(capture_settings_inputs(env={}))
    assert dict(settings.emotions) == dict(RAVDESS_EMOTIONS)
    assert settings.nn.hidden_layer_sizes == (300,)
    assert settings.nn.alpha == 0.01
    assert settings.nn.random_state == 42
    assert settings.training.test_size == 0.25


def test_env_capture_profile_flags_and_model_ids():
    env = {
        "SER_ENABLE_MEDIUM_PROFILE": "1",
        "SER_MEDIUM_MODEL_ID": "my/custom-model",
        "SER_MEDIUM_TIMEOUT_SECONDS": "45.5",
        "SER_DATASET_FOLDER": "/tmp/ds",
    }
    settings = build_settings_from_inputs(capture_settings_inputs(env=env))
    assert settings.runtime_flags.medium_profile is True
    assert settings.models.medium_model_id == "my/custom-model"
    assert settings.medium_runtime.timeout_seconds == 45.5
    # Untouched knobs keep catalog defaults.
    assert settings.medium_runtime.max_timeout_retries == 1
    assert settings.dataset.folder == Path("/tmp/ds")


def test_env_bool_rejects_garbage():
    with pytest.raises(SettingsInputError):
        read_env_bool({"X": "maybe"}, "X")


def test_settings_override_is_context_scoped():
    ambient = reload_settings()
    modified = dataclasses.replace(ambient, default_language="de")
    with settings_override(modified):
        assert get_settings().default_language == "de"
        with settings_override(dataclasses.replace(ambient, default_language="es")):
            assert get_settings().default_language == "es"
        assert get_settings().default_language == "de"
    assert get_settings().default_language == ambient.default_language


def test_jax_device_env_with_torch_alias():
    settings = build_settings_from_inputs(
        capture_settings_inputs(env={"SER_TORCH_DEVICE": "cpu", "SER_JAX_DTYPE": "bfloat16"})
    )
    assert settings.torch_runtime.device == "cpu"
    assert settings.torch_runtime.dtype == "bfloat16"


def test_artifact_names_are_profile_and_model_scoped():
    from ser_tpu.config import profile_artifact_file_names

    fast = profile_artifact_file_names(profile="fast")
    assert fast == ("ser_model.pkl", "ser_model.skops", "training_report.json")
    medium_a = profile_artifact_file_names(profile="medium", medium_model_id="org/model-a")
    medium_b = profile_artifact_file_names(profile="medium", medium_model_id="org/model-b")
    assert medium_a != medium_b
    assert medium_a[0].startswith("ser_model_medium_")
    research = profile_artifact_file_names(profile="accurate-research")
    assert research[0].startswith("ser_model_accurate_research_")


def test_env_capture_whisper_decode_strategy():
    env = {
        "WHISPER_DECODE_STRATEGY": "beam",
        "WHISPER_BEAM_SIZE": "4",
        "WHISPER_LENGTH_PENALTY": "0.8",
    }
    settings = build_settings_from_inputs(capture_settings_inputs(env=env))
    assert settings.transcription.decode_strategy == "beam"
    assert settings.transcription.beam_size == 4
    assert settings.transcription.length_penalty == 0.8
    # Default stays the TPU-latency greedy path.
    default = build_settings_from_inputs(capture_settings_inputs(env={}))
    assert default.transcription.decode_strategy == "greedy"
    assert default.transcription.beam_size == 5


def test_env_whisper_decode_strategy_validation():
    with pytest.raises(ValueError, match="WHISPER_DECODE_STRATEGY"):
        build_settings_from_inputs(
            capture_settings_inputs(env={"WHISPER_DECODE_STRATEGY": "mcts"})
        )
    with pytest.raises(ValueError, match="WHISPER_BEAM_SIZE"):
        build_settings_from_inputs(
            capture_settings_inputs(env={"WHISPER_BEAM_SIZE": "0"})
        )


def test_transcription_profile_carries_beam_settings():
    from ser_tpu._internal.transcript.extractor import resolve_transcription_profile

    settings = build_settings_from_inputs(
        capture_settings_inputs(env={"WHISPER_DECODE_STRATEGY": "beam", "WHISPER_BEAM_SIZE": "2"})
    )
    resolved = resolve_transcription_profile("fast", settings)
    assert resolved.decode_strategy == "beam"
    assert resolved.beam_size == 2
    assert resolved.length_penalty == 1.0


def test_env_whisper_length_penalty_validation():
    for bad in ("-1", "nan", "99"):
        with pytest.raises(ValueError, match="WHISPER_LENGTH_PENALTY"):
            build_settings_from_inputs(
                capture_settings_inputs(env={"WHISPER_LENGTH_PENALTY": bad})
            )


def test_reference_alias_env_names_are_honored():
    # Reference deployments spell these differently (SER_MODELS_DIR,
    # SER_MAX_WORKERS, ...); both spellings configure the same knobs.
    env = {
        "SER_MODELS_DIR": "/ref/models",
        "SER_TRANSCRIPTS_DIR": "/ref/transcripts",
        "SER_TMP_DIR": "/ref/tmp",
        "SER_MAX_WORKERS": "5",
        "SER_MAX_FAILED_FILES": "11",
        "SER_MAX_FAILED_FILE_RATIO": "0.07",
        "SER_STRICT_DATASET_AUDIT": "1",
        "SER_ENABLE_NEW_OUTPUT_SCHEMA": "1",
        "DATASET_FOLDER": "/ref/dataset",
        "DEFAULT_LANGUAGE": "fr",
    }
    settings = build_settings_from_inputs(capture_settings_inputs(env=env))
    assert settings.models.folder == Path("/ref/models")
    assert settings.timeline.folder == Path("/ref/transcripts")
    assert settings.tmp_folder == Path("/ref/tmp")
    assert settings.data_loader.max_workers == 5
    assert settings.data_loader.max_failed_files == 11
    assert settings.data_loader.max_failed_file_ratio == 0.07
    assert settings.dataset.strict_audit is True
    assert settings.runtime_flags.new_output_schema is True
    assert settings.dataset.folder == Path("/ref/dataset")
    assert settings.default_language == "fr"


def test_repo_specific_names_beat_reference_aliases():
    env = {
        "SER_MODELS_FOLDER": "/repo/models",
        "SER_MODELS_DIR": "/ref/models",
        "SER_DEFAULT_LANGUAGE": "en",
        "DEFAULT_LANGUAGE": "fr",
    }
    settings = build_settings_from_inputs(capture_settings_inputs(env=env))
    assert settings.models.folder == Path("/repo/models")
    assert settings.default_language == "en"


def test_cache_and_data_roots_rehome_derived_folders():
    env = {"SER_CACHE_DIR": "/c", "SER_DATA_DIR": "/d"}
    settings = build_settings_from_inputs(capture_settings_inputs(env=env))
    assert settings.tmp_folder == Path("/c/tmp")
    assert settings.models.model_cache_dir == Path("/c/model-cache")
    assert settings.models.folder == Path("/d/models")
    assert settings.timeline.folder == Path("/d/transcripts")
    # Specific overrides win over the roots.
    env2 = {**env, "SER_TMP_FOLDER": "/elsewhere/tmp"}
    settings2 = build_settings_from_inputs(capture_settings_inputs(env=env2))
    assert settings2.tmp_folder == Path("/elsewhere/tmp")


def test_training_split_and_quality_gate_env_knobs():
    env = {
        "SER_TEST_SIZE": "0.4",
        "SER_DEV_SIZE": "0.2",
        "SER_RANDOM_STATE": "7",
        "SER_QUALITY_GATE_MIN_UAR_DELTA": "0.05",
        "SER_MEDIUM_MIN_WINDOW_STD": "0.5",
        "SER_MEDIUM_MAX_WINDOWS_PER_CLIP": "9",
        "SER_OUTPUT_SCHEMA_VERSION": "v2",
        "SER_ARTIFACT_SCHEMA_VERSION": "v3",
        "SER_MODEL_FILE_NAME": "m.pkl",
        "SER_ENABLE_PROFILE_PIPELINE": "1",
        "SER_STRICT_QUARANTINE": "1",
        "SER_MAX_FAILURES_PER_REASON": "3",
        "SER_MIN_REMAINING_PER_CLASS_SPLIT": "5",
    }
    settings = build_settings_from_inputs(capture_settings_inputs(env=env))
    assert settings.training.test_size == 0.4
    assert settings.training.dev_size == 0.2
    assert settings.training.random_state == 7
    assert settings.quality_gate.min_uar_delta == 0.05
    assert settings.medium_training.min_window_std == 0.5
    assert settings.medium_training.max_windows_per_clip == 9
    assert settings.schema.output_schema_version == "v2"
    assert settings.schema.artifact_schema_version == "v3"
    assert settings.models.model_file_name == "m.pkl"
    assert settings.runtime_flags.profile_pipeline is True
    assert settings.data_loader.strict_quarantine is True
    assert settings.data_loader.max_failures_per_reason == 3
    assert settings.data_loader.min_remaining_per_class_split == 5


def test_manifest_lists_split_on_comma_or_pathsep():
    comma = capture_settings_inputs(env={"SER_DATASET_MANIFESTS": "/a.jsonl,/b.jsonl"})
    assert comma.dataset_manifests == (Path("/a.jsonl"), Path("/b.jsonl"))
    colon = capture_settings_inputs(env={"SER_DATASET_MANIFESTS": "/a.jsonl:/b.jsonl"})
    assert colon.dataset_manifests == (Path("/a.jsonl"), Path("/b.jsonl"))


class TestAdmissionEnvCapture:
    """Admission + calibration env knobs (reference SER_TRANSCRIPTION_MPS_*
    surface; canonical SER_TRANSCRIPTION_HBM_* names with MPS aliases)."""

    def test_hbm_canonical_names(self):
        settings = build_settings_from_inputs(
            capture_settings_inputs(env={
                "SER_TRANSCRIPTION_HBM_ADMISSION_CONTROL": "0",
                "SER_TRANSCRIPTION_HBM_MIN_HEADROOM_MB": "128",
                "SER_TRANSCRIPTION_HBM_SAFETY_MARGIN_MB": "64",
                "SER_TRANSCRIPTION_HBM_CALIBRATION_OVERRIDES": "0",
                "SER_TRANSCRIPTION_HBM_CALIBRATION_MIN_CONFIDENCE": "medium",
                "SER_TRANSCRIPTION_HBM_CALIBRATION_REPORT_MAX_AGE_HOURS": "24",
                "SER_TRANSCRIPTION_HBM_CALIBRATION_REPORT_PATH": "/tmp/cal.json",
            })
        )
        tx = settings.transcription
        assert tx.hbm_admission_control_enabled is False
        assert tx.hbm_admission_min_headroom_mb == 128.0
        assert tx.hbm_admission_safety_margin_mb == 64.0
        assert tx.calibration_overrides_enabled is False
        assert tx.calibration_min_confidence == "medium"
        assert tx.calibration_report_max_age_hours == 24.0
        assert str(tx.calibration_report_path) == "/tmp/cal.json"

    def test_reference_mps_aliases_honored(self):
        settings = build_settings_from_inputs(
            capture_settings_inputs(env={
                "SER_TRANSCRIPTION_MPS_ADMISSION_CONTROL": "0",
                "SER_TRANSCRIPTION_MPS_MIN_HEADROOM_MB": "512",
                "SER_TRANSCRIPTION_MPS_CALIBRATION_MIN_CONFIDENCE": "LOW",
            })
        )
        tx = settings.transcription
        assert tx.hbm_admission_control_enabled is False
        assert tx.hbm_admission_min_headroom_mb == 512.0
        assert tx.calibration_min_confidence == "low"

    def test_canonical_wins_over_alias(self):
        settings = build_settings_from_inputs(
            capture_settings_inputs(env={
                "SER_TRANSCRIPTION_HBM_MIN_HEADROOM_MB": "100",
                "SER_TRANSCRIPTION_MPS_MIN_HEADROOM_MB": "999",
            })
        )
        assert settings.transcription.hbm_admission_min_headroom_mb == 100.0

    def test_invalid_values_rejected(self):
        import pytest as _pytest

        with _pytest.raises(ValueError, match="headroom"):
            build_settings_from_inputs(
                capture_settings_inputs(
                    env={"SER_TRANSCRIPTION_HBM_MIN_HEADROOM_MB": "-1"}
                )
            )
        with _pytest.raises(ValueError, match="confidence"):
            build_settings_from_inputs(
                capture_settings_inputs(
                    env={"SER_TRANSCRIPTION_HBM_CALIBRATION_MIN_CONFIDENCE": "huge"}
                )
            )
        with _pytest.raises(ValueError, match="max age"):
            build_settings_from_inputs(
                capture_settings_inputs(
                    env={"SER_TRANSCRIPTION_HBM_CALIBRATION_REPORT_MAX_AGE_HOURS": "0"}
                )
            )


def test_consent_store_env_override(tmp_path, monkeypatch):
    """SER_RESTRICTED_BACKENDS_CONSENT_FILE relocates the consent store
    (reference license_check.py:89,106-110)."""
    from ser_tpu._internal.runtime import restricted_backends

    target = tmp_path / "my_consents.json"
    monkeypatch.setenv("SER_RESTRICTED_BACKENDS_CONSENT_FILE", str(target))
    restricted_backends.record_backend_consent("emotion2vec")
    assert target.is_file()
    assert restricted_backends.has_backend_consent("emotion2vec")
