"""Fast-profile training end to end on a synthetic RAVDESS corpus.

Parity surface: reference ``ser/_internal/models/fast_training.py`` — real
DSP feature extraction, stratified split, MLP head fit, artifact + JSON
training report, and reload-for-inference compatibility.
"""

import dataclasses
import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[4] / "scripts"))
from build_synthetic_ravdess_dataset import build_dataset  # noqa: E402

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    root = tmp_path_factory.mktemp("fast_train")
    build_dataset(root / "ds", actors=2, repetitions=2, seconds=1.6)
    settings = build_settings_from_inputs(
        capture_settings_inputs(
            env={
                "SER_DATASET_FOLDER": str(root / "ds"),
                "SER_MODELS_FOLDER": str(root / "models"),
                "SER_TMP_FOLDER": str(root / "tmp"),
            }
        )
    )
    settings = dataclasses.replace(
        settings,
        nn=dataclasses.replace(settings.nn, hidden_layer_sizes=(24,), max_iter=80),
    )
    from ser_tpu._internal.models.fast_training import train_fast_model

    report = train_fast_model(settings=settings)
    return settings, report


def test_report_carries_the_reference_metric_set(trained):
    _, report = trained
    for key in ("accuracy", "uar", "macro_f1", "per_class_recall", "labels"):
        assert key in report, key
    assert 0.0 <= report["uar"] <= 1.0
    assert report["training_samples"] >= 2


def test_report_carries_the_reference_schema_keys(trained):
    # Persisted training_report.json contract: reference
    # training_reporting.py:121-171 build_training_report.
    _, report = trained
    for key in (
        "artifact_version",
        "artifact_schema_version",
        "created_at_utc",
        "dataset_glob_pattern",
        "dataset_corpus_samples",
        "dataset_effective_samples",
        "dataset_skipped_samples",
        "train_samples",
        "test_samples",
        "feature_vector_size",
        "labels",
        "label_distribution",
        "metrics",
        "artifact_metadata",
        "model_artifacts",
    ):
        assert key in report, key
    assert report["dataset_effective_samples"] == (
        report["train_samples"] + report["test_samples"]
    )
    assert sum(report["label_distribution"].values()) == report["dataset_effective_samples"]
    assert "pickle" in report["model_artifacts"]
    assert Path(report["model_artifacts"]["secure"]).exists()  # metadata sidecar


def test_artifact_persists_and_reloads_for_inference(trained):
    _, report = trained
    model_path = Path(report["model_path"])
    assert model_path.exists()
    from ser_tpu._internal.models.artifacts import load_model_artifact

    loaded = load_model_artifact(str(model_path))
    assert loaded.artifact_metadata["profile"] == "fast"
    # The loaded head must predict over the fast feature dimension.
    import numpy as np

    from ser_tpu.ops.features import feature_dim

    settings, _ = trained
    dim = feature_dim(settings.feature_flags)
    prediction = loaded.model.predict(np.zeros((1, dim), dtype=np.float64))
    assert len(prediction) == 1


def test_training_report_file_written(trained):
    settings, report = trained
    report_path = Path(settings.models.training_report_file)
    assert report_path.exists()
    payload = json.loads(report_path.read_text())
    assert payload["uar"] == report["uar"]


def test_fast_inference_runs_on_the_trained_artifact(trained):
    settings, _ = trained
    from ser_tpu._internal.models.emotion_model import predict_emotions

    wav = next(Path(settings.dataset.folder).rglob("*.wav"))
    segments = predict_emotions(str(wav), settings=settings)
    assert segments, "expected at least one segment prediction"
    assert all(segment.end_seconds > segment.start_seconds for segment in segments)
