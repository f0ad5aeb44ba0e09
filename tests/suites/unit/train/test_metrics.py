"""Metric computation tests (reference train/metrics.py semantics)."""

import numpy as np
import pytest

from ser_tpu._internal.train.metrics import (
    accuracy,
    compute_grouped_ser_metrics_by_sample,
    compute_ser_metrics,
)


def test_perfect_predictions():
    metrics = compute_ser_metrics(y_true=["a", "b", "a"], y_pred=["a", "b", "a"])
    assert metrics["uar"] == 1.0
    assert metrics["macro_f1"] == 1.0
    assert metrics["per_class_recall"] == {"a": 1.0, "b": 1.0}


def test_uar_is_mean_per_class_recall():
    # class a: 2/2 recall, class b: 0/2 recall → UAR 0.5
    metrics = compute_ser_metrics(
        y_true=["a", "a", "b", "b"], y_pred=["a", "a", "a", "a"]
    )
    assert metrics["uar"] == pytest.approx(0.5)
    assert metrics["per_class_recall"]["b"] == 0.0


def test_matches_sklearn_reference():
    from sklearn.metrics import confusion_matrix, f1_score, recall_score

    rng = np.random.default_rng(0)
    labels = ["w", "x", "y", "z"]
    y_true = rng.choice(labels, 200).tolist()
    y_pred = rng.choice(labels, 200).tolist()
    ours = compute_ser_metrics(y_true=y_true, y_pred=y_pred, labels=labels)
    assert ours["uar"] == pytest.approx(
        recall_score(y_true, y_pred, average="macro", labels=labels)
    )
    assert ours["macro_f1"] == pytest.approx(
        f1_score(y_true, y_pred, average="macro", labels=labels)
    )
    np.testing.assert_array_equal(
        ours["confusion_matrix"], confusion_matrix(y_true, y_pred, labels=labels)
    )


def test_grouped_majority_vote():
    metrics = compute_grouped_ser_metrics_by_sample(
        y_true=["a", "a", "a", "b", "b"],
        y_pred=["a", "a", "b", "b", "b"],
        sample_ids=["s1", "s1", "s1", "s2", "s2"],
    )
    assert metrics["samples_evaluated"] == 2
    assert metrics["uar"] == 1.0  # majority votes: s1→a, s2→b


def test_grouped_min_support_excludes():
    metrics = compute_grouped_ser_metrics_by_sample(
        y_true=["a", "a", "b"],
        y_pred=["a", "a", "b"],
        sample_ids=["s1", "s1", "s2"],
        min_support=2,
    )
    assert metrics["samples_evaluated"] == 1
    assert metrics["samples_excluded"] == 1


def test_validation():
    with pytest.raises(ValueError):
        compute_ser_metrics(y_true=[], y_pred=[])
    with pytest.raises(ValueError):
        compute_ser_metrics(y_true=["a"], y_pred=["a", "b"])
    with pytest.raises(ValueError):
        accuracy([], [])
