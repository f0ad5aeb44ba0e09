"""Unit tests for the label-ontology policy engine (data/ontology.py)."""

import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.data.ontology import (
    LabelOntology,
    ensure_label_allowed,
    normalize_label,
    remap_label,
    resolve_label_ontology,
)


def _ontology(policy="drop", allowed=("angry", "happy", "other")):
    return LabelOntology(
        ontology_id="default_v1",
        allowed_labels=frozenset(allowed),
        unknown_label_policy=policy,
    )


def test_normalize_strips_and_lowercases():
    assert normalize_label("  ANGry ") == "angry"


def test_mapped_and_allowed_label_passes_through_normalized():
    got = remap_label(
        raw_label=" ANG ", mapping={"ANG": "Angry"}, ontology=_ontology()
    )
    assert got == "angry"


def test_unmapped_label_dropped_under_drop_policy():
    assert remap_label(raw_label="zzz", mapping={}, ontology=_ontology()) is None


def test_map_to_other_folds_unknowns():
    got = remap_label(
        raw_label="zzz", mapping={}, ontology=_ontology("map_to_other")
    )
    assert got == "other"


def test_map_to_other_with_disallowed_other_raises():
    ontology = _ontology("map_to_other", allowed=("angry", "happy"))
    with pytest.raises(ValueError, match="not part of ontology"):
        remap_label(raw_label="zzz", mapping={}, ontology=ontology)


def test_error_policy_raises_with_ontology_id():
    with pytest.raises(ValueError, match="default_v1"):
        remap_label(raw_label="zzz", mapping={}, ontology=_ontology("error"))


def test_ensure_label_allowed_accepts_member():
    ensure_label_allowed(label="angry", ontology=_ontology())


def _settings(env):
    return build_settings_from_inputs(capture_settings_inputs(env=env))


def test_resolve_defaults_to_emotion_map_values():
    ontology = resolve_label_ontology(_settings({}))
    assert ontology.ontology_id == "default_v1"
    assert ontology.unknown_label_policy == "drop"
    assert "angry" in ontology.allowed_labels
    assert "surprised" in ontology.allowed_labels


def test_resolve_honors_env_overrides():
    ontology = resolve_label_ontology(
        _settings(
            {
                "SER_LABEL_ONTOLOGY_ID": "research_v2",
                "SER_ALLOWED_LABELS": " Angry , happy ,,OTHER",
                "SER_UNKNOWN_LABEL_POLICY": "MAP_TO_OTHER",
                "SER_OTHER_LABEL": " Other ",
            }
        )
    )
    assert ontology.ontology_id == "research_v2"
    assert ontology.allowed_labels == frozenset({"angry", "happy", "other"})
    assert ontology.unknown_label_policy == "map_to_other"
    assert ontology.other_label == "other"


def test_unrecognized_policy_env_falls_back_to_drop():
    # Silent fallback, matching reference label_ontology.py:12-18.
    ontology = resolve_label_ontology(
        _settings({"SER_UNKNOWN_LABEL_POLICY": "explode"})
    )
    assert ontology.unknown_label_policy == "drop"
