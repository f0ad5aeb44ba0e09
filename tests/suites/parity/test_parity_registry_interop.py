"""Differential interop: the dataset registry file cross-loads both ways.

Reference stage: ``ser/_internal/data/dataset_registry.py:125-210``. Like
consents, the registry is durable user state at
``<models_parent>/.ser/dataset_registry.json`` — registered datasets must
survive a framework switch in either direction, including the free-form
options map.
"""

from __future__ import annotations

import dataclasses

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.data.registry import (
    DatasetRegistryRecord,
    list_registered_datasets,
    register_dataset,
)


def _settings(tmp_path):
    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={"SER_MODELS_FOLDER": str(tmp_path / "models")}
        )
    )
    # Force the reference-path branch (no redirected registry root).
    return dataclasses.replace(
        settings, dataset=dataclasses.replace(settings.dataset, registry_root=None)
    )


OPTIONS = {"labels_csv_path": "labels.csv", "source_repo_id": "org/data"}


def test_reference_registry_loads_here(oracle, tmp_path):
    theirs = oracle.call(
        "registry",
        data_root=str(tmp_path),
        upsert={
            "dataset_id": "RAVDESS",
            "dataset_root": str(tmp_path / "corpora/ravdess"),
            "manifest_path": str(tmp_path / "manifests/ravdess.jsonl"),
            "options": OPTIONS,
        },
    )
    assert "ravdess" in theirs  # reference normalizes ids to lowercase
    records = list_registered_datasets(settings=_settings(tmp_path))
    by_id = {record.dataset_id: record for record in records}
    assert "ravdess" in by_id
    assert by_id["ravdess"].dataset_root == theirs["ravdess"]["dataset_root"]
    assert by_id["ravdess"].manifest_path == theirs["ravdess"]["manifest_path"]
    assert by_id["ravdess"].options == OPTIONS


def test_our_registry_loads_in_reference(oracle, tmp_path):
    settings = _settings(tmp_path)
    register_dataset(
        DatasetRegistryRecord(
            dataset_id="crema-d",
            dataset_root=str(tmp_path / "corpora/crema"),
            manifest_path=str(tmp_path / "manifests/crema.jsonl"),
            utterance_count=7442,
            options={"audio_base_dir": "AudioWAV"},
        ),
        settings=settings,
    )
    theirs = oracle.call("registry", data_root=str(tmp_path))
    assert theirs["crema-d"]["dataset_root"] == str(tmp_path / "corpora/crema")
    assert theirs["crema-d"]["manifest_path"] == str(tmp_path / "manifests/crema.jsonl")
    assert theirs["crema-d"]["options"] == {"audio_base_dir": "AudioWAV"}
