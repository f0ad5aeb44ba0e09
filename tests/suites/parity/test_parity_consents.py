"""Differential interop: the dataset consent store cross-loads byte-for-byte.

Reference stage: ``ser/_internal/data/dataset_consents.py:39-120``. Consents
are durable user state on disk — a user switching frameworks must keep every
previously granted policy/license acknowledgement, in both directions.
"""

from __future__ import annotations

import json

from ser_tpu._internal.data.consents import (
    configure_dataset_consents,
    show_dataset_consents,
)


def test_reference_store_loads_here(oracle, tmp_path, monkeypatch):
    path = tmp_path / "dataset_consents.json"
    theirs = oracle.call(
        "consents",
        path=str(path),
        accept_policy_ids=["Policy-MSP ", "ravdess-cc"],
        accept_license_ids=["CC-BY-4.0"],
        source="cli:test",
    )
    assert path.is_file()
    monkeypatch.setenv("SER_DATASET_CONSENTS_FILE", str(path))
    ours = show_dataset_consents()
    assert set(ours.policy_ids) == set(theirs["policy_consents"])
    assert set(ours.license_ids) == set(theirs["license_consents"])
    # Normalization matches: stripped + lowercased ids.
    assert "policy-msp" in ours.policy_ids


def test_our_store_loads_in_reference_and_merges(oracle, tmp_path, monkeypatch):
    path = tmp_path / "dataset_consents.json"
    monkeypatch.setenv("SER_DATASET_CONSENTS_FILE", str(path))
    configure_dataset_consents(
        accept_policy_ids=("ravdess-cc",),
        accept_license_ids=(" CC-BY-NC-SA-4.0 ",),
        source="repo:test",
    )
    payload = json.loads(path.read_text(encoding="utf-8"))
    assert payload["schema_version"] == 1
    assert payload["policy_consents"] == {"ravdess-cc": "repo:test"}
    assert payload["license_consents"] == {"cc-by-nc-sa-4.0": "repo:test"}

    # The reference loads our store AND merges into it without data loss.
    theirs = oracle.call(
        "consents",
        path=str(path),
        accept_policy_ids=["msp-academic"],
        source="ref:test",
    )
    assert theirs["policy_consents"] == {
        "ravdess-cc": "repo:test",
        "msp-academic": "ref:test",
    }
    assert theirs["license_consents"] == {"cc-by-nc-sa-4.0": "repo:test"}
    # And our side sees the reference's merge.
    ours = show_dataset_consents()
    assert set(ours.policy_ids) == {"ravdess-cc", "msp-academic"}
