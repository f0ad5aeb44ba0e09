"""Differential parity: dataset capability profile table.

Reference stage: ``ser/_internal/data/dataset_capabilities.py:8-313`` — the
static per-dataset capability metadata that drives ``ser data catalog``
pipeline-planning output. Every field of every one of the 16 profiles must
match the reference value-for-value.
"""

from __future__ import annotations

from ser_tpu._internal.data.capabilities import list_dataset_capability_profiles


def test_capability_profiles_match_reference_exactly(oracle):
    reference = {row["dataset_id"]: row for row in oracle.call("capability_profiles")}
    ours = {
        profile.dataset_id: {
            "dataset_id": profile.dataset_id,
            "summary": profile.summary,
            "modalities": list(profile.modalities),
            "label_schema": profile.label_schema,
            "has_label_mapping": profile.has_label_mapping,
            "supervised_ser_candidate": profile.supervised_ser_candidate,
            "ssl_candidate": profile.ssl_candidate,
            "multimodal_candidate": profile.multimodal_candidate,
            "mergeable_with_emotion_ontology": profile.mergeable_with_emotion_ontology,
            "recommended_uses": list(profile.recommended_uses),
            "notes": list(profile.notes),
        }
        for profile in list_dataset_capability_profiles()
    }
    assert sorted(ours) == sorted(reference)
    for dataset_id, expected in reference.items():
        assert ours[dataset_id] == expected, dataset_id
