"""Differential parity: utterance split ladder + salted hash split.

Reference stages: ``ser/_internal/models/dataset_splitting.py:183-233``
(salted SHA-1 per-label hash split), ``:254-366`` (split ladder: manifest
split -> speaker-grouped GroupShuffleSplit -> deterministic hash fallback,
with MediumSplitMetadata provenance). Sample-id membership must match
exactly: these splits decide what trains and are persisted in prepared
plans and training reports.
"""

from __future__ import annotations

from types import SimpleNamespace

from hypothesis import given, settings as hyp_settings
from hypothesis import strategies as st

from ser_tpu._internal.data.manifest import Utterance
from ser_tpu._internal.models.dataset_splitting import (
    hash_stratified_split,
    split_utterances,
)

LABELS = ["angry", "calm", "happy", "sad"]


def _utterance(index: int, label: str, speaker_id: str | None, split: str | None):
    return Utterance(
        sample_id=f"sample-{index:03d}",
        corpus="ravdess" if index % 3 else "crema-d",
        audio_path=f"/data/clip-{index:03d}.wav",
        label=label,
        speaker_id=speaker_id,
        split=split,
    )


def _payload(utterances: list[Utterance]) -> list[dict]:
    return [
        {
            "sample_id": item.sample_id,
            "corpus": item.corpus,
            "audio_path": item.audio_path,
            "label": item.label,
            "speaker_id": item.speaker_id,
            "split": item.split,
        }
        for item in utterances
    ]


@st.composite
def utterance_sets(draw):
    count = draw(st.integers(min_value=2, max_value=40))
    speaker_mode = draw(st.sampled_from(["full", "partial", "none"]))
    split_mode = draw(st.sampled_from(["full", "partial", "none"]))
    utterances = []
    for index in range(count):
        label = LABELS[draw(st.integers(min_value=0, max_value=3))]
        if speaker_mode == "full":
            speaker = f"spk{index % 5:02d}"
        elif speaker_mode == "partial" and index % 2:
            speaker = f"spk{index % 5:02d}"
        else:
            speaker = None
        if split_mode == "full":
            split = ("train", "dev", "test")[index % 3]
        elif split_mode == "partial" and index % 2:
            split = ("train", "test")[index % 2]
        else:
            split = None
        utterances.append(_utterance(index, label, speaker, split))
    test_size = draw(st.sampled_from([0.2, 0.25, 0.3333, 0.5]))
    random_state = draw(st.integers(min_value=0, max_value=10_000))
    return utterances, test_size, random_state


@hyp_settings(max_examples=80, deadline=None)
@given(inputs=utterance_sets())
def test_hash_stratified_split_parity(oracle, inputs):
    utterances, test_size, _ = inputs
    salt = "ser:42"
    train, test = hash_stratified_split(
        samples=utterances, test_size=test_size, salt=salt
    )
    theirs = oracle.call(
        "hash_split", samples=_payload(utterances), test_size=test_size, salt=salt
    )
    assert [item.sample_id for item in train] == theirs["train"]
    assert [item.sample_id for item in test] == theirs["test"]


@hyp_settings(max_examples=80, deadline=None)
@given(inputs=utterance_sets())
def test_split_utterances_ladder_parity(oracle, inputs):
    utterances, test_size, random_state = inputs
    config = SimpleNamespace(
        training=SimpleNamespace(test_size=test_size, random_state=random_state)
    )
    try:
        train, test, metadata = split_utterances(samples=utterances, settings=config)
        error = None
    except (RuntimeError, ValueError) as err:
        train = test = metadata = None
        error = type(err).__name__
    try:
        theirs = oracle.call(
            "split_utterances",
            samples=_payload(utterances),
            test_size=test_size,
            random_state=random_state,
        )
        theirs_error = None
    except Exception as err:  # noqa: BLE001 - error-parity comparison
        theirs = None
        theirs_error = getattr(err, "error_type", type(err).__name__)
    assert error == theirs_error
    if error is None:
        assert [item.sample_id for item in train] == theirs["train"]
        assert [item.sample_id for item in test] == theirs["test"]
        assert metadata.as_dict() == theirs["metadata"]


@hyp_settings(max_examples=50, deadline=None)
@given(inputs=utterance_sets(), dev_size=st.sampled_from([0.1, 0.15, 0.2]))
def test_split_utterances_three_way_parity(oracle, inputs, dev_size):
    from dataclasses import dataclass

    from ser_tpu._internal.models.dataset_splitting import split_utterances_three_way

    utterances, test_size, random_state = inputs

    @dataclass(frozen=True)
    class _Training:
        test_size: float
        dev_size: float
        random_state: int

    @dataclass(frozen=True)
    class _Settings:
        training: _Training

    config = _Settings(_Training(test_size, dev_size, random_state))
    try:
        train, dev, test, metadata = split_utterances_three_way(
            samples=utterances, settings=config
        )
        error = None
    except (RuntimeError, ValueError) as err:
        train = dev = test = metadata = None
        error = type(err).__name__
    try:
        theirs = oracle.call(
            "split_utterances_three_way",
            samples=_payload(utterances),
            test_size=test_size,
            dev_size=dev_size,
            random_state=random_state,
        )
        theirs_error = None
    except Exception as err:  # noqa: BLE001 - error-parity comparison
        theirs = None
        theirs_error = getattr(err, "error_type", type(err).__name__)
    assert error == theirs_error
    if error is None:
        assert [item.sample_id for item in train] == theirs["train"]
        assert [item.sample_id for item in dev] == theirs["dev"]
        assert [item.sample_id for item in test] == theirs["test"]
        assert metadata.split_strategy == theirs["split_strategy"]
        assert metadata.speaker_overlap_count == theirs["speaker_overlap_count"]


def test_ravdess_filename_speaker_fallback_parity(oracle):
    # Utterances without speaker_id but with RAVDESS-named files: the ladder
    # must resolve corpus-scoped speakers from the filename on both sides
    # (reference dataset_splitting.py:171-181) and still produce a grouped
    # split.
    utterances = [
        Utterance(
            sample_id=f"rav-{i:02d}",
            corpus="ravdess",
            audio_path=f"/data/03-01-0{1 + i % 4}-01-01-01-{1 + i % 6:02d}.wav",
            label=LABELS[i % 4],
        )
        for i in range(18)
    ]
    config = SimpleNamespace(training=SimpleNamespace(test_size=0.25, random_state=3))
    train, test, metadata = split_utterances(samples=utterances, settings=config)
    theirs = oracle.call(
        "split_utterances",
        samples=_payload(utterances),
        test_size=0.25,
        random_state=3,
    )
    assert metadata.split_strategy == "group_shuffle_split"
    assert [item.sample_id for item in train] == theirs["train"]
    assert [item.sample_id for item in test] == theirs["test"]
    assert metadata.as_dict() == theirs["metadata"]


def test_manifest_split_strategy_parity(oracle):
    # All-assigned manifests honor the recorded split (train+dev vs test).
    utterances = [
        _utterance(i, LABELS[i % 4], f"spk{i % 3}", ("train", "dev", "test")[i % 3])
        for i in range(12)
    ]
    config = SimpleNamespace(training=SimpleNamespace(test_size=0.25, random_state=42))
    train, test, metadata = split_utterances(samples=utterances, settings=config)
    theirs = oracle.call(
        "split_utterances",
        samples=_payload(utterances),
        test_size=0.25,
        random_state=42,
    )
    assert metadata.split_strategy == "manifest_split"
    assert metadata.as_dict() == theirs["metadata"]
    assert [item.sample_id for item in train] == theirs["train"]
    assert [item.sample_id for item in test] == theirs["test"]
