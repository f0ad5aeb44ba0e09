"""End-to-end fast-profile smoke: synthetic RAVDESS → train → infer.

Mirrors the reference CI strategy (SURVEY.md §4: synthetic dataset smoke lane,
``scripts/build_synthetic_ravdess_dataset.py``): no downloads, deterministic
audio, the real training + inference stack.
"""

import dataclasses
import sys
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[3] / "scripts"))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402


@pytest.fixture(scope="module")
def workspace(tmp_path_factory):
    root = tmp_path_factory.mktemp("fast_smoke")
    dataset_dir = root / "dataset"
    files = build_dataset(dataset_dir, actors=2, repetitions=2, seconds=3.2)
    return root, dataset_dir, files


@pytest.fixture(scope="module")
def trained_settings(workspace):
    root, dataset_dir, _ = workspace
    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs

    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(dataset_dir),
                "SER_MODELS_FOLDER": str(root / "models"),
                "SER_TRANSCRIPTS_FOLDER": str(root / "transcripts"),
            }
        )
    )
    # Keep the smoke fit snappy: smaller head, fewer epochs.
    return dataclasses.replace(
        settings,
        nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(64,), max_iter=150),
    )


def test_train_then_infer_round_trip(trained_settings, workspace):
    _, _, files = workspace
    from ser_tpu._internal.models.emotion_model import (
        predict_emotions,
        predict_emotions_detailed,
        train_model,
    )

    report = train_model(settings=trained_settings)
    assert report["accuracy"] >= 0.75  # synthetic classes are tone-separable
    assert Path(report["model_path"]).exists()
    assert Path(report["report_path"]).exists()
    assert set(report["per_class_recall"]) == set(report["labels"])

    # Infer on a known file: code 05 → angry.
    target = next(f for f in files if f.name.startswith("03-01-05"))
    result = predict_emotions_detailed(str(target), settings=trained_settings)
    assert result.schema_version == "v1"
    assert len(result.frames) == 4  # 3.2 s clip, 3 s frames, 1 s stride
    assert all(np.isfinite(f.confidence) for f in result.frames)
    assert result.segments

    legacy = predict_emotions(str(target), settings=trained_settings)
    assert [seg.emotion for seg in legacy] == [seg.emotion for seg in result.segments]


def test_loaded_artifact_enforces_profile(trained_settings):
    from ser_tpu._internal.models.emotion_model import load_model

    loaded = load_model(settings=trained_settings, profile="fast")
    assert loaded.expected_feature_size == 193
    assert loaded.artifact_metadata["backend_id"] == "handcrafted"
