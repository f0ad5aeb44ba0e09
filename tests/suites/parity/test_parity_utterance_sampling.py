"""Differential parity: hierarchical utterance sampling + window selection.

Reference stage: ``ser/_internal/models/utterance_sampling.py:1-120`` —
sqrt-corpus / inverse-sqrt-class sampling probabilities, sha256-keyed
deterministic bounded window selection, and contribution reporting. The
probabilities feed batch schedules, so they must match BIT FOR BIT, including
float summation order.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reference_oracle import OracleRemoteError
from ser_tpu._internal.models.utterance_sampling import (
    UtteranceSamplingItem,
    sampling_contributions,
    select_training_windows,
    utterance_sampling_distribution,
)

CORPORA = ["ravdess", "crema_d", "emodb"]
LABELS = ["angry", "happy", "neutral", "sad"]


@st.composite
def sampling_items(draw) -> list[dict]:
    count = draw(st.integers(min_value=1, max_value=40))
    rows = []
    for index in range(count):
        rows.append(
            {
                "sample_id": f"s{index:03d}",
                "corpus": draw(st.sampled_from(CORPORA)),
                "label": draw(st.sampled_from(LABELS)),
                "window_count": draw(st.integers(min_value=1, max_value=30)),
                "duration_seconds": draw(
                    st.one_of(
                        st.none(),
                        st.floats(min_value=0.1, max_value=60.0, allow_nan=False),
                    )
                ),
            }
        )
    return rows


def _items(rows: list[dict]) -> list[UtteranceSamplingItem]:
    return [UtteranceSamplingItem(**row) for row in rows]


@settings(max_examples=150, deadline=None)
@given(rows=sampling_items())
def test_sampling_distribution_bitwise_parity(oracle, rows):
    reference = oracle.call("sampling_distribution", items=rows)
    repo = utterance_sampling_distribution(_items(rows))
    assert [(r.sample_id, r.corpus, r.label, r.probability) for r in repo] == reference


@settings(max_examples=60, deadline=None)
@given(rows=sampling_items())
def test_sampling_contributions_bitwise_parity(oracle, rows):
    reference = oracle.call("sampling_contributions", items=rows)
    assert sampling_contributions(_items(rows)) == reference


@settings(max_examples=150, deadline=None)
@given(
    sample_id=st.text(
        alphabet=st.characters(min_codepoint=33, max_codepoint=126), min_size=1, max_size=24
    ),
    window_count=st.integers(min_value=1, max_value=400),
    max_windows=st.integers(min_value=1, max_value=64),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    epoch=st.integers(min_value=0, max_value=50),
)
def test_select_windows_bitwise_parity(
    oracle, sample_id, window_count, max_windows, seed, epoch
):
    reference = oracle.call(
        "select_windows",
        sample_id=sample_id,
        window_count=window_count,
        max_windows=max_windows,
        seed=seed,
        epoch=epoch,
    )
    repo = select_training_windows(
        sample_id=sample_id,
        window_count=window_count,
        max_windows=max_windows,
        seed=seed,
        epoch=epoch,
    )
    assert repo == tuple(reference)
    assert len(repo) == min(window_count, max_windows)
    assert sorted(set(repo)) == list(repo)


@pytest.mark.parametrize(
    "bad_row",
    [
        {"sample_id": " ", "corpus": "ravdess", "label": "angry", "window_count": 1},
        {"sample_id": "a", "corpus": "", "label": "angry", "window_count": 1},
        {"sample_id": "a", "corpus": "ravdess", "label": " ", "window_count": 1},
        {"sample_id": "a", "corpus": "ravdess", "label": "angry", "window_count": 0},
        {
            "sample_id": "a",
            "corpus": "ravdess",
            "label": "angry",
            "window_count": 2,
            "duration_seconds": 0.0,
        },
    ],
)
def test_validation_parity(oracle, bad_row):
    with pytest.raises(OracleRemoteError) as reference_error:
        oracle.call("sampling_distribution", items=[bad_row])
    with pytest.raises(ValueError):
        utterance_sampling_distribution(_items([bad_row]))
    assert reference_error.value.error_type == "ValueError"


def test_duplicate_and_empty_parity(oracle):
    row = {"sample_id": "a", "corpus": "ravdess", "label": "angry", "window_count": 1}
    with pytest.raises(OracleRemoteError):
        oracle.call("sampling_distribution", items=[row, dict(row)])
    with pytest.raises(ValueError, match="Duplicate"):
        utterance_sampling_distribution(_items([row, dict(row)]))
    with pytest.raises(OracleRemoteError):
        oracle.call("sampling_distribution", items=[])
    with pytest.raises(ValueError, match="empty"):
        utterance_sampling_distribution([])
