"""Differential parity: evaluation metrics and fast-path segment merge.

Reference stages: ``ser/_internal/train/metrics.py:11-73`` (UAR/macro-F1/
per-class recall/confusion over explicit label order — sklearn-backed there,
numpy here), ``:76-162`` (per-sample majority vote with ``(-count, label)``
tie-break, per-group min-support report), and
``ser/_internal/models/fast_path.py:99-144`` (adjacent-equal-label segment
merge with fmean confidence/probability aggregation).

Metrics must match to float64 round-off (both sides reduce the same
confusion counts); segment outputs must match bitwise (pure Python floats
flowing straight into rendered timelines).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ser_tpu._internal.models.fast_path import segment_predictions
from ser_tpu._internal.train.metrics import (
    compute_grouped_ser_metrics_by_sample,
    compute_ser_metrics,
)
from ser_tpu.runtime.schema import FramePrediction

LABELS = ["angry", "calm", "happy", "sad"]

label_lists = st.lists(st.sampled_from(LABELS), min_size=1, max_size=60)


@st.composite
def label_pairs(draw) -> tuple[list[str], list[str]]:
    y_true = draw(label_lists)
    y_pred = draw(
        st.lists(
            st.sampled_from(LABELS), min_size=len(y_true), max_size=len(y_true)
        )
    )
    return y_true, y_pred


def _approx_tree(value, abs_tol=1e-12):
    """Recursive approx-compare wrapper for nested metric payloads."""
    if isinstance(value, float):
        return pytest.approx(value, abs=abs_tol)
    if isinstance(value, dict):
        return {key: _approx_tree(item, abs_tol) for key, item in value.items()}
    if isinstance(value, list):
        return [_approx_tree(item, abs_tol) for item in value]
    return value


@settings(max_examples=150, deadline=None)
@given(pair=label_pairs())
def test_ser_metrics_parity(oracle, pair):
    y_true, y_pred = pair
    ours = compute_ser_metrics(y_true=y_true, y_pred=y_pred)
    theirs = oracle.call("ser_metrics", y_true=y_true, y_pred=y_pred)
    assert ours["labels"] == theirs["labels"]
    assert ours["confusion_matrix"] == theirs["confusion_matrix"]
    assert ours["uar"] == pytest.approx(theirs["uar"], abs=1e-12)
    assert ours["macro_f1"] == pytest.approx(theirs["macro_f1"], abs=1e-12)
    assert ours["per_class_recall"] == _approx_tree(theirs["per_class_recall"])


def test_ser_metrics_explicit_label_order_parity(oracle):
    # Explicit labels pin class order; absent classes count 0 recall.
    y_true = ["sad", "happy", "sad"]
    y_pred = ["sad", "sad", "sad"]
    labels = ["calm", "happy", "sad", "angry"]
    ours = compute_ser_metrics(y_true=y_true, y_pred=y_pred, labels=labels)
    theirs = oracle.call("ser_metrics", y_true=y_true, y_pred=y_pred, labels=labels)
    assert ours["labels"] == theirs["labels"]
    assert ours["confusion_matrix"] == theirs["confusion_matrix"]
    assert ours["uar"] == pytest.approx(theirs["uar"], abs=1e-12)
    assert ours["macro_f1"] == pytest.approx(theirs["macro_f1"], abs=1e-12)


@st.composite
def grouped_inputs(draw):
    n = draw(st.integers(min_value=0, max_value=80))
    y_true = draw(st.lists(st.sampled_from(LABELS), min_size=n, max_size=n))
    y_pred = draw(st.lists(st.sampled_from(LABELS), min_size=n, max_size=n))
    sample_ids = draw(
        st.lists(st.sampled_from([f"s{i}" for i in range(12)]), min_size=n, max_size=n)
    )
    group_ids = draw(
        st.lists(st.sampled_from(["ravdess", "crema-d", "mesd"]), min_size=n, max_size=n)
    )
    min_support = draw(st.integers(min_value=1, max_value=6))
    return y_true, y_pred, sample_ids, group_ids, min_support


@settings(max_examples=150, deadline=None)
@given(inputs=grouped_inputs())
def test_grouped_metrics_parity(oracle, inputs):
    y_true, y_pred, sample_ids, group_ids, min_support = inputs
    ours = compute_grouped_ser_metrics_by_sample(
        y_true=y_true,
        y_pred=y_pred,
        sample_ids=sample_ids,
        group_ids=group_ids,
        min_support=min_support,
    )
    theirs = oracle.call(
        "grouped_metrics",
        y_true=y_true,
        y_pred=y_pred,
        sample_ids=sample_ids,
        group_ids=group_ids,
        min_support=min_support,
    )
    assert ours == _approx_tree(theirs)


@st.composite
def frame_payloads(draw) -> list[dict]:
    count = draw(st.integers(min_value=0, max_value=30))
    frames = []
    # One shared probability-label universe per run; individual frames may
    # drop to None (predict_proba unavailable) which nulls aggregation.
    proba_labels = draw(st.sampled_from([LABELS, LABELS[:2], None]))
    for index in range(count):
        emotion = draw(st.sampled_from(LABELS))
        confidence = draw(
            st.floats(min_value=0.0, max_value=1.0, allow_nan=False)
        )
        if proba_labels is None or draw(st.booleans()) is False:
            probabilities = None
        else:
            raw = [
                draw(st.floats(min_value=0.001, max_value=1.0, allow_nan=False))
                for _ in proba_labels
            ]
            total = sum(raw)
            probabilities = {
                label: value / total for label, value in zip(proba_labels, raw)
            }
        frames.append(
            {
                "start_seconds": index * 1.0,
                "end_seconds": (index + 1) * 1.0,
                "emotion": emotion,
                "confidence": float(confidence),
                "probabilities": probabilities,
            }
        )
    return frames


@settings(max_examples=150, deadline=None)
@given(frames=frame_payloads())
def test_segment_predictions_parity(oracle, frames):
    ours = segment_predictions(
        [FramePrediction(**frame) for frame in frames]
    )
    theirs = oracle.call("segment_predictions", frames=frames)
    assert len(ours) == len(theirs)
    for segment, expected in zip(ours, theirs):
        assert segment.emotion == expected["emotion"]
        assert segment.start_seconds == expected["start_seconds"]  # bitwise
        assert segment.end_seconds == expected["end_seconds"]
        assert segment.confidence == expected["confidence"]
        assert segment.probabilities == expected["probabilities"]
