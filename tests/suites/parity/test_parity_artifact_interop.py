"""Differential interop: model artifacts cross-load between repo and reference.

Reference stage: ``ser/_internal/models/artifact_envelope.py:101-160`` +
``artifact_loading.py:56-110``. The drop-in-switch contract is concrete here:
an artifact trained with the reference must load in this framework with
identical predictions, and an artifact persisted here (sklearn estimator
payload) must satisfy the reference's strict envelope validation.
"""

from __future__ import annotations

import numpy as np

from ser_tpu._internal.models.artifacts import (
    build_artifact_metadata,
    build_model_artifact,
    load_model_artifact,
    save_model_artifact,
)

LABELS = ["angry", "calm", "happy", "sad"]


def _dataset(seed: int = 0, n: int = 48, dim: int = 12):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, dim))
    y = [LABELS[i % len(LABELS)] for i in range(n)]
    # Separable-ish classes so the tiny MLP converges.
    for i, label in enumerate(y):
        x[i, LABELS.index(label)] += 3.0
    return x, y


def test_reference_artifact_loads_here_with_identical_predictions(
    oracle, tmp_path
):
    x, y = _dataset()
    path = tmp_path / "ref_model.pkl"
    theirs = oracle.call(
        "persist_artifact", x=x.tolist(), y=y, path=str(path), backend_id="handcrafted"
    )
    loaded = load_model_artifact(
        path, expected_backend_id="handcrafted", expected_profile="fast"
    )
    assert loaded.expected_feature_size == x.shape[1]
    ours = [str(p) for p in loaded.model.predict(x)]
    assert ours == theirs["predictions"]
    proba = np.asarray(loaded.model.predict_proba(x))
    assert np.allclose(proba, np.asarray(theirs["proba"]))


def test_our_artifact_passes_reference_validation(oracle, tmp_path):
    from sklearn.neural_network import MLPClassifier

    x, y = _dataset(seed=1)
    model = MLPClassifier(hidden_layer_sizes=(8,), max_iter=300, random_state=42)
    model.fit(x, y)
    metadata = build_artifact_metadata(
        feature_vector_size=x.shape[1],
        training_samples=x.shape[0],
        labels=sorted(set(y)),
        backend_id="handcrafted",
        profile="fast",
        # v3 provenance digests must survive the reference's strict
        # normalize_v3 load validation (artifact_metadata.py:231-234).
        recipe_digest="ab" * 32,
        split_ledger_digest="cd" * 32,
    )
    path = tmp_path / "ours.pkl"
    save_model_artifact(build_model_artifact(model, metadata), path)
    theirs = oracle.call("load_artifact", path=str(path), x=x.tolist())
    assert theirs["expected_feature_size"] == x.shape[1]
    assert theirs["backend_id"] == "handcrafted"
    assert theirs["predictions"] == [str(p) for p in model.predict(x)]
