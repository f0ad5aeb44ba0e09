"""Speaker-grouped splitting for leakage-free evaluation.

Parity surface: reference ``ser/_internal/train/eval.py:57-137`` — splits are
grouped by speaker (GroupShuffleSplit semantics) so no speaker appears in both
train and test, with a deterministic seed and a fallback that guarantees at
least one group on each side.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from typing import TypeVar

import numpy as np

T = TypeVar("T")


def speaker_disjoint_split(
    items: Sequence[T],
    *,
    speaker_of: Callable[[T], str],
    label_of: Callable[[T], str] | None = None,
    test_size: float = 0.25,
    random_state: int = 42,
) -> tuple[list[T], list[T]]:
    """Splits items into speaker-disjoint train/test partitions.

    Groups are assigned whole to one side. Assignment is a deterministic
    shuffle of speakers, filling the test side until its share of items
    reaches ``test_size``; both sides are guaranteed non-empty when two or
    more speakers exist.
    """
    if not items:
        raise ValueError("Cannot split an empty item sequence.")
    if not (0.0 < test_size < 1.0):
        raise ValueError("test_size must be in (0, 1).")

    speakers: dict[str, list[T]] = {}
    for item in items:
        speakers.setdefault(str(speaker_of(item)), []).append(item)

    speaker_ids = sorted(speakers)
    if len(speaker_ids) < 2:
        # Single speaker: fall back to an item-level split (leakage warning is
        # the caller's concern; the reference falls back similarly).
        if len(items) < 2:
            raise ValueError(
                "Cannot split a single item into train and test partitions."
            )
        rng = np.random.default_rng(random_state)
        order = rng.permutation(len(items))
        # Both partitions stay non-empty regardless of rounding.
        n_test = min(max(1, int(round(test_size * len(items)))), len(items) - 1)
        test_idx = set(order[:n_test].tolist())
        train = [item for i, item in enumerate(items) if i not in test_idx]
        test = [item for i, item in enumerate(items) if i in test_idx]
        return train, test

    rng = np.random.default_rng(random_state)
    shuffled = [speaker_ids[i] for i in rng.permutation(len(speaker_ids))]
    target_test = test_size * len(items)
    test_speakers: set[str] = set()
    count = 0
    for speaker in shuffled:
        if count >= target_test and test_speakers:
            break
        test_speakers.add(speaker)
        count += len(speakers[speaker])
        if len(test_speakers) >= len(speaker_ids) - 1:
            break

    train = [item for item in items if str(speaker_of(item)) not in test_speakers]
    test = [item for item in items if str(speaker_of(item)) in test_speakers]

    if label_of is not None:
        # Best-effort label coverage: a speaker-disjoint assignment can strand
        # every sample of a rare class on the test side, so the trained head
        # would never see that class. Pull the smallest test speaker carrying
        # a train-missing label back into train (while test stays non-empty).
        def labels_of(side):
            return {str(label_of(item)) for item in side}

        missing = labels_of(test) - labels_of(train)
        while missing and len(test_speakers) > 1:
            carriers = sorted(
                (
                    speaker
                    for speaker in test_speakers
                    if any(
                        str(label_of(item)) in missing for item in speakers[speaker]
                    )
                ),
                key=lambda speaker: (len(speakers[speaker]), speaker),
            )
            if not carriers:
                break
            test_speakers.discard(carriers[0])
            train = [
                item for item in items if str(speaker_of(item)) not in test_speakers
            ]
            test = [item for item in items if str(speaker_of(item)) in test_speakers]
            missing = labels_of(test) - labels_of(train)
    return train, test


def stratified_group_folds(
    items: Sequence[T],
    *,
    speaker_of: Callable[[T], str],
    n_folds: int = 4,
    random_state: int = 42,
) -> list[tuple[list[T], list[T]]]:
    """Speaker-grouped K folds for cross-validation (quality-gate evaluation)."""
    speakers = sorted({str(speaker_of(item)) for item in items})
    if len(speakers) < 2:
        raise ValueError(
            "Grouped cross-validation needs at least 2 speakers; got "
            f"{len(speakers)} (speaker-disjoint folds are impossible)."
        )
    if len(speakers) < n_folds:
        n_folds = max(2, len(speakers))
    rng = np.random.default_rng(random_state)
    shuffled = [speakers[i] for i in rng.permutation(len(speakers))]
    fold_of = {speaker: i % n_folds for i, speaker in enumerate(shuffled)}
    folds: list[tuple[list[T], list[T]]] = []
    for fold in range(n_folds):
        train = [item for item in items if fold_of[str(speaker_of(item))] != fold]
        test = [item for item in items if fold_of[str(speaker_of(item))] == fold]
        if train and test:
            folds.append((train, test))
    return folds


__all__ = ["speaker_disjoint_split", "stratified_group_folds"]
