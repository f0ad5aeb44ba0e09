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
