"""Differential parity: speaker-grouped splits and CV folds.

Reference stages: ``ser/_internal/train/eval.py:30-37`` (RAVDESS speaker-id
extraction), ``:57-97`` (GroupShuffleSplit train/test with validation
ladder), ``:100-137`` (StratifiedGroupKFold CV). Split INDICES must match
exactly — they decide which files train which model, and the reference
records them in ledgers and prepared plans.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reference_oracle import OracleRemoteError
from ser_tpu._internal.train.eval import (
    extract_ravdess_speaker_id,
    grouped_train_test_split,
    speaker_independent_cv,
)

LABELS = ["angry", "calm", "happy", "sad"]


@st.composite
def split_inputs(draw):
    n_speakers = draw(st.integers(min_value=2, max_value=12))
    per_speaker = draw(st.integers(min_value=1, max_value=6))
    labels, speaker_ids = [], []
    for speaker in range(n_speakers):
        for index in range(per_speaker):
            speaker_ids.append(f"{speaker + 1:02d}")
            labels.append(LABELS[(speaker + index) % len(LABELS)])
    test_size = draw(st.sampled_from([0.1, 0.2, 0.25, 0.3333, 0.5, 0.8]))
    random_state = draw(st.integers(min_value=0, max_value=2**31 - 1))
    return labels, speaker_ids, test_size, random_state


@settings(max_examples=100, deadline=None)
@given(inputs=split_inputs())
def test_grouped_train_test_split_index_parity(oracle, inputs):
    labels, speaker_ids, test_size, random_state = inputs
    features = np.zeros((len(labels), 1), dtype=np.float64)
    try:
        ours = grouped_train_test_split(
            features, labels, speaker_ids, test_size=test_size, random_state=random_state
        )
        error = None
    except ValueError:
        # e.g. test_size=0.8 over 2 speakers: sklearn rejects an empty train
        # side — both sides must reject identically.
        ours = None
        error = "ValueError"
    try:
        theirs = oracle.call(
            "grouped_split",
            labels=labels,
            speaker_ids=speaker_ids,
            test_size=test_size,
            random_state=random_state,
        )
        theirs_error = None
    except OracleRemoteError as err:
        theirs = None
        theirs_error = err.error_type
    assert error == theirs_error
    if error is None:
        assert ours.train_indices.tolist() == theirs["train"]
        assert ours.test_indices.tolist() == theirs["test"]
        assert ours.y_train == theirs["y_train"]
        assert ours.y_test == theirs["y_test"]


@settings(max_examples=60, deadline=None)
@given(inputs=split_inputs(), n_splits=st.integers(min_value=2, max_value=5))
def test_speaker_independent_cv_fold_parity(oracle, inputs, n_splits):
    labels, speaker_ids, _, random_state = inputs
    features = np.zeros((len(labels), 1), dtype=np.float64)
    try:
        ours = speaker_independent_cv(
            features, labels, speaker_ids, n_splits=n_splits, random_state=random_state
        )
        ours_payload = [(train.tolist(), test.tolist()) for train, test in ours]
        error = None
    except ValueError as err:
        ours_payload = None
        error = str(err)
    try:
        theirs = oracle.call(
            "speaker_cv",
            labels=labels,
            speaker_ids=speaker_ids,
            n_splits=n_splits,
            random_state=random_state,
        )
        theirs_error = None
    except OracleRemoteError as err:
        theirs = None
        theirs_error = err.message
    if error is None:
        assert theirs_error is None
        assert [tuple(fold) for fold in theirs] == ours_payload
    else:
        # Error parity: both sides reject (sklearn raises when a class has
        # fewer members than n_splits etc.).
        assert theirs_error is not None


@settings(max_examples=150, deadline=None)
@given(
    name=st.one_of(
        st.sampled_from(
            [
                "03-01-06-01-02-01-12.wav",
                "03-01-06-01-02-01-12",
                "short.wav",
                "a-b-c-d-e-f-.wav",
                "a-b-c-d-e-f- .wav",
                "/tmp/Actor_01/03-01-01-01-01-01-01.wav",
            ]
        ),
        st.text(
            alphabet=st.sampled_from("0123456789-. _abc/"), min_size=0, max_size=40
        ),
    )
)
def test_extract_ravdess_speaker_id_parity(oracle, name):
    assert extract_ravdess_speaker_id(name) == oracle.call(
        "extract_speaker_id", file_name=name
    )


def test_validation_message_parity(oracle):
    features = np.zeros((2, 1), dtype=np.float64)
    with pytest.raises(ValueError, match="At least two distinct speaker IDs"):
        grouped_train_test_split(
            features, ["a", "b"], ["s", "s"], test_size=0.5, random_state=0
        )
    with pytest.raises(OracleRemoteError, match="At least two distinct speaker IDs"):
        oracle.call(
            "grouped_split",
            labels=["a", "b"],
            speaker_ids=["s", "s"],
            test_size=0.5,
            random_state=0,
        )
