"""Internal runtime API: profile overrides + load_profile validation."""

import pytest

from ser_tpu._internal.api.runtime import apply_cli_profile_override, load_profile
from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.runtime.registry import UnsupportedProfileError


def _settings(**env):
    return build_settings_from_inputs(capture_settings_inputs(env=env))


def test_override_none_is_identity():
    settings = _settings()
    assert apply_cli_profile_override(settings, None) is settings


def test_override_sets_exclusive_profile_flags():
    settings = apply_cli_profile_override(_settings(), "accurate")
    flags = settings.runtime_flags
    assert flags.profile_pipeline
    assert flags.accurate_profile and not flags.medium_profile
    assert not flags.accurate_research_profile
    # Transcription defaults follow the catalog for the chosen profile.
    assert settings.transcription.use_demucs is True

    downgraded = apply_cli_profile_override(settings, "fast")
    assert not downgraded.runtime_flags.accurate_profile
    assert downgraded.transcription.use_demucs is False


def test_override_rejects_unknown_profile():
    with pytest.raises(ValueError, match="Unknown profile"):
        apply_cli_profile_override(_settings(), "turbo")  # type: ignore[arg-type]


def test_load_profile_validates_fast_and_rejects_gated():
    settings = _settings()
    load_profile("fast", settings=settings)  # fast is always available
    # accurate-research is restricted AND flag-gated → unsupported by default.
    with pytest.raises(UnsupportedProfileError):
        load_profile("accurate-research", settings=settings)


def test_load_profile_accepts_enabled_encoder_profile():
    load_profile("medium", settings=_settings(SER_ENABLE_MEDIUM_PROFILE="1"))
