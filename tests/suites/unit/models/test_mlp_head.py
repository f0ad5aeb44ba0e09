"""JAX MLP head tests: sklearn-shaped API, learning, serialization."""

import numpy as np
import pytest

from ser_tpu._internal.config.schema import NeuralNetConfig
from ser_tpu.models.mlp_head import JaxMLPClassifier


def _blobs(n_per_class=60, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    centers = {"alpha": 2.0, "beta": -2.0, "gamma": 0.0}
    xs, ys = [], []
    for label, center in centers.items():
        xs.append(center + 0.5 * rng.standard_normal((n_per_class, dim)))
        ys.extend([label] * n_per_class)
    return np.concatenate(xs), np.asarray(ys)


@pytest.fixture(scope="module")
def fitted():
    X, y = _blobs()
    model = JaxMLPClassifier(
        hidden_layer_sizes=(32,), batch_size=32, max_iter=150, random_state=0
    )
    return model.fit(X, y), X, y


def test_learns_separable_blobs(fitted):
    model, X, y = fitted
    assert model.score(X, y) > 0.95


def test_classes_sorted(fitted):
    model, _, _ = fitted
    assert model.classes_.tolist() == ["alpha", "beta", "gamma"]


def test_predict_proba_rows_sum_to_one(fitted):
    model, X, _ = fitted
    proba = model.predict_proba(X[:10])
    assert proba.shape == (10, 3)
    np.testing.assert_allclose(proba.sum(axis=1), 1.0, atol=1e-5)
    # predict agrees with argmax of predict_proba.
    np.testing.assert_array_equal(
        model.predict(X[:10]), model.classes_[np.argmax(proba, axis=1)]
    )


def test_state_round_trip(fitted):
    model, X, _ = fitted
    clone = JaxMLPClassifier.from_state(model.get_state())
    np.testing.assert_array_equal(clone.predict(X[:20]), model.predict(X[:20]))
    np.testing.assert_allclose(
        clone.predict_proba(X[:20]), model.predict_proba(X[:20]), atol=1e-6
    )


def test_deterministic_given_seed():
    X, y = _blobs(n_per_class=30)
    a = JaxMLPClassifier(hidden_layer_sizes=(16,), max_iter=20, random_state=7).fit(X, y)
    b = JaxMLPClassifier(hidden_layer_sizes=(16,), max_iter=20, random_state=7).fit(X, y)
    np.testing.assert_allclose(a.predict_proba(X), b.predict_proba(X), atol=1e-6)


def test_from_config_uses_reference_hyperparams():
    model = JaxMLPClassifier.from_config(NeuralNetConfig())
    assert model.hidden_layer_sizes == (300,)
    assert model.alpha == 0.01
    assert model.batch_size == 256
    assert model.max_iter == 500
    assert model.random_state == 42


def test_unfitted_raises():
    with pytest.raises(RuntimeError):
        JaxMLPClassifier().predict(np.zeros((1, 3)))


def test_validation_errors():
    with pytest.raises(ValueError):
        JaxMLPClassifier().fit(np.zeros((0, 3)), [])
    with pytest.raises(ValueError):
        JaxMLPClassifier().fit(np.zeros((2, 3)), ["a"])


def test_single_class_raises_like_sklearn():
    import numpy as np
    import pytest

    from ser_tpu.models.mlp_head import JaxMLPClassifier

    with pytest.raises(ValueError, match="at least 2 classes"):
        JaxMLPClassifier(max_iter=2).fit(
            np.zeros((4, 3), np.float32), ["same"] * 4
        )


def test_auto_batch_size_matches_sklearn():
    """'auto' = min(200, n_samples), not full batch (sklearn semantics)."""
    import numpy as np

    from ser_tpu.models.mlp_head import JaxMLPClassifier

    rng = np.random.default_rng(0)
    x = rng.standard_normal((30, 4)).astype(np.float32)
    y = (["a"] * 15) + (["b"] * 15)
    model = JaxMLPClassifier(batch_size="auto", max_iter=3, hidden_layer_sizes=(8,))
    model.fit(x, y)
    assert model.n_iter_ >= 1  # structural: 'auto' must not crash/full-batch
