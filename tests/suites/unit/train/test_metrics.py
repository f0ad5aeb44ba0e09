"""Metric computation tests (reference train/metrics.py semantics)."""

import numpy as np
import pytest

from ser_tpu._internal.train.metrics import (
    accuracy,
    compute_grouped_ser_metrics_by_sample,
    compute_sample_level_ser_metrics,
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
    metrics = compute_sample_level_ser_metrics(
        y_true=["a", "a", "a", "b", "b"],
        y_pred=["a", "a", "b", "b", "b"],
        sample_ids=["s1", "s1", "s1", "s2", "s2"],
    )
    assert metrics["samples_evaluated"] == 2
    assert metrics["uar"] == 1.0  # majority votes: s1→a, s2→b


def test_grouped_min_support_excludes():
    metrics = compute_sample_level_ser_metrics(
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


def test_group_metrics_reference_semantics():
    # Two corpora; corpus "d" has one sample and falls under min_support.
    result = compute_grouped_ser_metrics_by_sample(
        y_true=["a", "a", "b", "b", "a"],
        y_pred=["a", "b", "b", "b", "b"],
        sample_ids=["s1", "s1", "s2", "s2", "s3"],
        group_ids=["c", "c", "c", "c", "d"],
        min_support=2,
    )
    assert result["unit"] == "samples"
    assert result["min_support"] == 2
    assert set(result["included"]) == {"c"}
    assert result["included"]["c"]["support"] == 2
    # s1 votes: true a, pred tie a/b -> lexical "a"; s2: true b, pred b.
    assert result["included"]["c"]["metrics"]["uar"] == 1.0
    assert result["excluded"] == {"d": {"support": 1}}


def test_group_metrics_group_id_majority_vote():
    # A sample whose windows disagree on group id resolves by mode with
    # lexical tie-break.
    result = compute_grouped_ser_metrics_by_sample(
        y_true=["a", "a", "a"],
        y_pred=["a", "a", "a"],
        sample_ids=["s1", "s1", "s1"],
        group_ids=["x", "y", "y"],
        min_support=1,
    )
    assert set(result["included"]) == {"y"}


def test_group_metrics_empty_returns_report_not_raise():
    result = compute_grouped_ser_metrics_by_sample(
        y_true=[], y_pred=[], sample_ids=[], group_ids=[], min_support=3
    )
    assert result == {
        "unit": "samples",
        "min_support": 3,
        "included": {},
        "excluded": {},
    }


def test_group_metrics_validation():
    with pytest.raises(ValueError):
        compute_grouped_ser_metrics_by_sample(
            y_true=["a"], y_pred=["a"], sample_ids=["s"], group_ids=[], min_support=1
        )
    with pytest.raises(ValueError):
        compute_grouped_ser_metrics_by_sample(
            y_true=["a"], y_pred=["a"], sample_ids=["s"], group_ids=["c"], min_support=0
        )
