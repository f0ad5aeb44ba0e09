"""Per-owner tests for ``_internal/train/eval.py`` speaker-grouped splitting.

Parity surface: reference ``ser/_internal/train/eval.py:57-137`` —
GroupShuffleSplit semantics (speaker-disjoint partitions, deterministic
seeding, non-empty sides).
"""

import pytest

from ser_tpu._internal.train.eval import speaker_disjoint_split, stratified_group_folds


def _items(n_speakers: int, per_speaker: int, labels=("a", "b")):
    out = []
    for s in range(n_speakers):
        for i in range(per_speaker):
            out.append((f"spk{s:02d}", labels[(s + i) % len(labels)], i))
    return out


SPEAKER = lambda item: item[0]  # noqa: E731
LABEL = lambda item: item[1]  # noqa: E731


def test_split_is_speaker_disjoint_and_nonempty():
    items = _items(8, 5)
    train, test = speaker_disjoint_split(items, speaker_of=SPEAKER, test_size=0.25)
    assert train and test
    assert {SPEAKER(i) for i in train}.isdisjoint({SPEAKER(i) for i in test})
    assert sorted(train + test) == sorted(items)


def test_split_is_deterministic_in_seed():
    items = _items(10, 3)
    first = speaker_disjoint_split(items, speaker_of=SPEAKER, random_state=7)
    second = speaker_disjoint_split(items, speaker_of=SPEAKER, random_state=7)
    assert first == second
    other = speaker_disjoint_split(items, speaker_of=SPEAKER, random_state=8)
    # A different seed is allowed to coincide, but across 10 speakers the
    # shuffled assignment virtually always differs; assert the mechanism.
    assert {SPEAKER(i) for i in other[1]} != set() and first[0]


def test_split_test_share_tracks_requested_size():
    items = _items(20, 4)
    train, test = speaker_disjoint_split(items, speaker_of=SPEAKER, test_size=0.25)
    share = len(test) / len(items)
    assert 0.15 <= share <= 0.40  # whole-speaker granularity around 0.25


def test_label_coverage_pullback_restores_train_missing_class():
    # One rare class carried by a single speaker: when that speaker lands in
    # test, every train example of the class would vanish. label_of pulls the
    # carrier back into train.
    items = [("spk_rare", "rare", 0)] + [
        (f"spk{s}", "common", i) for s in range(4) for i in range(4)
    ]
    for seed in range(10):
        train, test = speaker_disjoint_split(
            items,
            speaker_of=SPEAKER,
            label_of=LABEL,
            test_size=0.4,
            random_state=seed,
        )
        train_labels = {LABEL(i) for i in train}
        test_labels = {LABEL(i) for i in test}
        assert test_labels <= train_labels
        assert train and test


def test_single_speaker_falls_back_to_item_split():
    items = [("solo", "a", i) for i in range(10)]
    train, test = speaker_disjoint_split(items, speaker_of=SPEAKER, test_size=0.3)
    assert train and test
    assert sorted(train + test) == sorted(items)


def test_empty_and_bad_test_size_raise():
    with pytest.raises(ValueError):
        speaker_disjoint_split([], speaker_of=SPEAKER)
    with pytest.raises(ValueError):
        speaker_disjoint_split(_items(2, 2), speaker_of=SPEAKER, test_size=1.0)
    with pytest.raises(ValueError):
        speaker_disjoint_split([("solo", "a", 0)], speaker_of=SPEAKER)


def test_group_folds_are_speaker_disjoint_and_cover_items():
    items = _items(9, 3)
    folds = stratified_group_folds(items, speaker_of=SPEAKER, n_folds=4)
    assert len(folds) == 4
    for train, test in folds:
        assert train and test
        assert {SPEAKER(i) for i in train}.isdisjoint({SPEAKER(i) for i in test})
        assert sorted(train + test) == sorted(items)
    # Every speaker appears in exactly one fold's test side.
    test_speakers = [frozenset(SPEAKER(i) for i in test) for _, test in folds]
    all_test = set().union(*test_speakers)
    assert all_test == {SPEAKER(i) for i in items}
    assert sum(len(s) for s in test_speakers) == len(all_test)


def test_group_folds_clamp_to_speaker_count_and_reject_single_speaker():
    items = _items(3, 2)
    folds = stratified_group_folds(items, speaker_of=SPEAKER, n_folds=10)
    assert len(folds) == 3
    with pytest.raises(ValueError, match="2 speakers"):
        stratified_group_folds([("solo", "a", 0)], speaker_of=SPEAKER)
