"""Artifact envelope persistence/loading/compat tests."""

import pickle

import numpy as np
import pytest

from ser_tpu._internal.models import artifacts
from ser_tpu.models.mlp_head import JaxMLPClassifier


def _tiny_model():
    X = np.concatenate([np.full((10, 4), 1.0), np.full((10, 4), -1.0)])
    y = ["pos"] * 10 + ["neg"] * 10
    return JaxMLPClassifier(hidden_layer_sizes=(8,), max_iter=30, random_state=0).fit(X, y)


def _metadata(**overrides):
    base = dict(
        feature_vector_size=4,
        training_samples=20,
        labels=["neg", "pos"],
        backend_id="handcrafted",
        profile="fast",
    )
    base.update(overrides)
    return artifacts.build_artifact_metadata(**base)


def test_round_trip_native_model(tmp_path):
    model = _tiny_model()
    envelope = artifacts.build_model_artifact(model, _metadata())
    path = artifacts.save_model_artifact(envelope, tmp_path / "ser_model.pkl")
    loaded = artifacts.load_model_artifact(path)
    assert isinstance(loaded.model, JaxMLPClassifier)
    assert loaded.expected_feature_size == 4
    assert loaded.artifact_metadata["artifact_version"] == 3
    X = np.full((3, 4), 1.0)
    np.testing.assert_array_equal(loaded.model.predict(X), model.predict(X))
    # Metadata sidecar exists for no-unpickle inspection.
    assert (tmp_path / "ser_model.pkl.meta.json").exists()


def test_backend_mismatch_rejected(tmp_path):
    envelope = artifacts.build_model_artifact(_tiny_model(), _metadata(backend_id="jax_xlsr"))
    path = artifacts.save_model_artifact(envelope, tmp_path / "ser_model.pkl")
    with pytest.raises(artifacts.ArtifactError, match="backend mismatch"):
        artifacts.load_model_artifact(path, expected_backend_id="handcrafted")


def test_profile_mismatch_rejected(tmp_path):
    envelope = artifacts.build_model_artifact(_tiny_model(), _metadata(profile="medium"))
    path = artifacts.save_model_artifact(envelope, tmp_path / "ser_model.pkl")
    with pytest.raises(artifacts.ArtifactError, match="profile mismatch"):
        artifacts.load_model_artifact(path, expected_profile="fast")


def test_unsupported_version_rejected(tmp_path):
    envelope = artifacts.build_model_artifact(_tiny_model(), _metadata())
    envelope["metadata"]["artifact_version"] = 99
    path = tmp_path / "ser_model.pkl"
    path.write_bytes(pickle.dumps(envelope))
    with pytest.raises(artifacts.ArtifactError, match="version"):
        artifacts.load_model_artifact(path)


class _LegacyStub:
    classes_ = np.array(["a", "b"])

    def predict(self, X):
        return np.array(["a"] * len(X))


def test_legacy_bare_pickle_accepted(tmp_path):
    """Pre-envelope artifacts (bare estimator pickle) load with no metadata."""
    path = tmp_path / "ser_model.pkl"
    path.write_bytes(pickle.dumps(_LegacyStub()))
    loaded = artifacts.load_model_artifact(path)
    assert loaded.expected_feature_size is None
    assert loaded.model.predict(np.zeros((2, 3))).tolist() == ["a", "a"]


def test_metadata_validation():
    with pytest.raises(artifacts.ArtifactError):
        artifacts.build_artifact_metadata(
            feature_vector_size=0, training_samples=1, labels=["x"]
        )
    with pytest.raises(artifacts.ArtifactError):
        artifacts.build_artifact_metadata(
            feature_vector_size=1, training_samples=1, labels=[]
        )


def test_provenance_digests_round_trip(tmp_path):
    """v3 recipe/split-ledger digests persist and survive load validation."""
    recipe = "ab" * 32
    ledger = "cd" * 32
    meta = _metadata(recipe_digest=recipe, split_ledger_digest=ledger)
    envelope = artifacts.build_model_artifact(_tiny_model(), meta)
    path = artifacts.save_model_artifact(envelope, tmp_path / "ser_model.pkl")
    loaded = artifacts.load_model_artifact(path)
    assert loaded.artifact_metadata["recipe_digest"] == recipe
    assert loaded.artifact_metadata["split_ledger_digest"] == ledger


def test_provenance_digests_absent_when_unset():
    """The writer drops None digests (reference artifact_metadata.py:303-310)."""
    meta = _metadata()
    assert "recipe_digest" not in meta
    assert "split_ledger_digest" not in meta


def test_provenance_digest_rejects_non_hex():
    with pytest.raises(artifacts.ArtifactError, match="recipe_digest"):
        _metadata(recipe_digest="not-a-sha256")
    with pytest.raises(artifacts.ArtifactError, match="split_ledger_digest"):
        _metadata(split_ledger_digest="AB" * 32)  # uppercase is invalid


def test_load_rejects_malformed_provenance_digest(tmp_path):
    """Hand-edited digests fail load (reference artifact_metadata.py:202-208)."""
    envelope = artifacts.build_model_artifact(_tiny_model(), _metadata())
    envelope["metadata"]["split_ledger_digest"] = "tampered"
    path = tmp_path / "ser_model.pkl"
    path.write_bytes(pickle.dumps(envelope))
    with pytest.raises(artifacts.ArtifactError, match="split_ledger_digest"):
        artifacts.load_model_artifact(path)


def test_discover_candidates_sorted_newest_first(tmp_path):
    import time

    for name in ("ser_model_old.pkl", "ser_model_new.pkl"):
        (tmp_path / name).write_bytes(b"x")
        time.sleep(0.01)
    found = artifacts.discover_artifact_candidates(tmp_path)
    assert [p.name for p in found] == ["ser_model_new.pkl", "ser_model_old.pkl"]
