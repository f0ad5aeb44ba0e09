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
