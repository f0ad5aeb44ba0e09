"""Catalog validation and profile precedence tests (reference ser/profiles.py semantics)."""

from ser_tpu.profiles import (
    PROFILE_NAMES,
    get_profile_catalog,
    resolve_profile_name,
)


def test_catalog_contains_all_profiles():
    catalog = get_profile_catalog()
    assert tuple(catalog) == PROFILE_NAMES


def test_catalog_runtime_budgets_match_reference_values():
    catalog = get_profile_catalog()
    assert catalog["fast"].runtime_defaults.timeout_seconds == 0.0
    assert catalog["medium"].runtime_defaults.timeout_seconds == 60.0
    assert catalog["medium"].runtime_defaults.max_timeout_retries == 1
    assert catalog["medium"].runtime_defaults.retry_backoff_seconds == 0.25
    assert catalog["accurate"].runtime_defaults.timeout_seconds == 120.0
    assert catalog["accurate"].runtime_defaults.max_timeout_retries == 0
    assert catalog["accurate-research"].runtime_defaults.timeout_seconds == 120.0
    for name in PROFILE_NAMES:
        defaults = catalog[name].runtime_defaults
        assert defaults.pool_window_size_seconds == 1.0
        assert defaults.pool_window_stride_seconds == 1.0
        assert defaults.post_smoothing_window_frames == 3
        assert defaults.post_hysteresis_enter_confidence == 0.60
        assert defaults.post_hysteresis_exit_confidence == 0.45
        assert defaults.post_min_segment_duration_seconds == 0.40


def test_catalog_model_ids():
    catalog = get_profile_catalog()
    assert catalog["fast"].model.default_model_id is None
    assert catalog["medium"].model.default_model_id == "facebook/wav2vec2-xls-r-300m"
    assert catalog["accurate"].model.default_model_id == "openai/whisper-large-v3"
    assert catalog["accurate-research"].model.default_model_id == "iic/emotion2vec_plus_large"


def test_runtime_env_names_follow_reference_scheme():
    catalog = get_profile_catalog()
    assert catalog["medium"].runtime_env["timeout_seconds"] == "SER_MEDIUM_TIMEOUT_SECONDS"
    assert (
        catalog["accurate-research"].runtime_env["post_min_segment_duration_seconds"]
        == "SER_ACCURATE_RESEARCH_POST_MIN_SEGMENT_DURATION_SECONDS"
    )
    assert catalog["medium"].enable_flag == "SER_ENABLE_MEDIUM_PROFILE"
    assert catalog["accurate-research"].enable_flag == "SER_ENABLE_ACCURATE_RESEARCH_PROFILE"
    assert catalog["fast"].enable_flag is None
    assert catalog["medium"].model.env_var == "SER_MEDIUM_MODEL_ID"


def test_profile_precedence():
    assert resolve_profile_name(
        medium_profile=False, accurate_profile=False, accurate_research_profile=False
    ) == "fast"
    assert resolve_profile_name(
        medium_profile=True, accurate_profile=False, accurate_research_profile=False
    ) == "medium"
    assert resolve_profile_name(
        medium_profile=True, accurate_profile=True, accurate_research_profile=False
    ) == "accurate"
    assert resolve_profile_name(
        medium_profile=True, accurate_profile=True, accurate_research_profile=True
    ) == "accurate-research"


def test_catalog_validation_strictness(tmp_path, monkeypatch):
    """Unknown profiles, boolean ints, zero strides, and typo'd runtime
    defaults are rejected at catalog load, not at first inference."""
    import yaml

    from ser_tpu import profiles as profiles_mod

    original_path = profiles_mod._CATALOG_PATH
    base = yaml.safe_load(original_path.read_text())

    def load_with(mutate):
        raw = yaml.safe_load(original_path.read_text())
        mutate(raw)
        path = tmp_path / "defs.yaml"
        path.write_text(yaml.safe_dump(raw))
        monkeypatch.setattr(profiles_mod, "_CATALOG_PATH", path)
        profiles_mod.get_profile_catalog.cache_clear()
        try:
            return profiles_mod.get_profile_catalog()
        finally:
            profiles_mod.get_profile_catalog.cache_clear()
            monkeypatch.setattr(profiles_mod, "_CATALOG_PATH", original_path)

    import pytest

    with pytest.raises(profiles_mod.ProfileCatalogError, match="Unknown profile"):
        load_with(lambda raw: raw["profiles"].update({"acurate": dict(base["profiles"]["fast"])}))
    with pytest.raises(profiles_mod.ProfileCatalogError, match="boolean"):
        load_with(
            lambda raw: raw["profiles"]["fast"]["runtime_defaults"].update(
                {"post_smoothing_window_frames": False}
            )
        )
    with pytest.raises(profiles_mod.ProfileCatalogError, match="must be > 0"):
        load_with(
            lambda raw: raw["profiles"]["fast"]["runtime_defaults"].update(
                {"pool_window_stride_seconds": 0.0}
            )
        )
    with pytest.raises(profiles_mod.ProfileCatalogError, match="unknown key"):
        load_with(
            lambda raw: raw["profiles"]["accurate"].update(
                {"feature_runtime_defaults": {"dytpe": "bfloat16"}}
            )
        )
    with pytest.raises(profiles_mod.ProfileCatalogError, match="not one of"):
        load_with(
            lambda raw: raw["profiles"]["fast"]["transcription_defaults"].update(
                {"backend_id": "jaxwhisper"}
            )
        )
