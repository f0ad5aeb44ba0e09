"""Per-owner tests for ``_internal/models/dataset_splitting.py``.

Behavior spec: reference ``ser/_internal/models/dataset_splitting.py`` —
salted-hash determinism, the manifest/grouped/hash ladder, corpus-scoped
speaker fallback, and SER_SPLIT_SALT resolution.
"""

from __future__ import annotations

from dataclasses import dataclass

import pytest

from ser_tpu._internal.data.manifest import Utterance
from ser_tpu._internal.models.dataset_splitting import (
    hash_for_split,
    hash_stratified_split,
    resolve_corpus_scoped_speaker_id,
    split_salt,
    split_utterances,
    split_utterances_three_way,
)


@dataclass(frozen=True)
class _Training:
    test_size: float = 0.25
    dev_size: float = 0.1
    random_state: int = 42


@dataclass(frozen=True)
class _Settings:
    training: _Training = _Training()


def _utterance(index, label="happy", speaker=None, split=None, corpus="ravdess"):
    return Utterance(
        sample_id=f"s{index:03d}",
        corpus=corpus,
        audio_path=f"/data/{index:03d}.wav",
        label=label,
        speaker_id=speaker,
        split=split,
    )


class TestHashSplit:
    def test_hash_token_is_parity_constant(self):
        # sha1("salt|id")[:8] big-endian — pinned so the split never drifts.
        assert hash_for_split("sample-001", salt="ser:42") == int.from_bytes(
            __import__("hashlib").sha1(b"ser:42|sample-001").digest()[:8], "big"
        )

    def test_split_is_deterministic_and_salt_sensitive(self):
        samples = [_utterance(i, label=("a", "b")[i % 2]) for i in range(20)]
        first = hash_stratified_split(samples=samples, test_size=0.25, salt="x")
        second = hash_stratified_split(samples=samples, test_size=0.25, salt="x")
        other = hash_stratified_split(samples=samples, test_size=0.25, salt="y")
        as_ids = lambda split: [[u.sample_id for u in side] for side in split]  # noqa: E731
        assert as_ids(first) == as_ids(second)
        assert as_ids(first) != as_ids(other)

    def test_singleton_label_stays_in_train(self):
        samples = [_utterance(i, label="a") for i in range(6)] + [
            _utterance(99, label="rare")
        ]
        train, test = hash_stratified_split(samples=samples, test_size=0.3, salt="s")
        assert any(u.label == "rare" for u in train)
        assert not any(u.label == "rare" for u in test)

    def test_both_sides_nonempty(self):
        samples = [_utterance(i, label=f"l{i}") for i in range(3)]  # all singletons
        train, test = hash_stratified_split(samples=samples, test_size=0.5, salt="s")
        assert train and test


class TestLadder:
    def test_manifest_split_honored(self):
        samples = [
            _utterance(i, split=("train", "dev", "test")[i % 3]) for i in range(9)
        ]
        train, test, metadata = split_utterances(samples=samples, settings=_Settings())
        assert metadata.split_strategy == "manifest_split"
        assert all(u.split in {"train", "dev"} for u in train)
        assert all(u.split == "test" for u in test)

    def test_grouped_when_full_speaker_coverage(self):
        samples = [_utterance(i, speaker=f"spk{i % 4}") for i in range(16)]
        train, test, metadata = split_utterances(samples=samples, settings=_Settings())
        assert metadata.split_strategy == "group_shuffle_split"
        assert metadata.speaker_grouped is True
        assert metadata.speaker_overlap_count == 0
        train_speakers = {u.speaker_id for u in train}
        assert train_speakers.isdisjoint({u.speaker_id for u in test})

    def test_hash_fallback_on_partial_speaker_coverage(self):
        samples = [
            _utterance(i, speaker=f"spk{i}" if i % 2 else None) for i in range(10)
        ]
        _, _, metadata = split_utterances(samples=samples, settings=_Settings())
        assert metadata.split_strategy == "hash_stratified_split"
        assert metadata.speaker_id_coverage == 0.5

    def test_requires_two_samples(self):
        with pytest.raises(RuntimeError, match="at least two"):
            split_utterances(samples=[_utterance(0)], settings=_Settings())

    def test_split_salt_env_override(self, monkeypatch):
        monkeypatch.delenv("SER_SPLIT_SALT", raising=False)
        assert split_salt(_Settings()) == "ser:42"
        monkeypatch.setenv("SER_SPLIT_SALT", "  custom ")
        assert split_salt(_Settings()) == "custom"


class TestThreeWay:
    def test_native_three_way_preserved(self):
        samples = [
            _utterance(i, split=("train", "dev", "test")[i % 3]) for i in range(12)
        ]
        train, dev, test, metadata = split_utterances_three_way(
            samples=samples, settings=_Settings()
        )
        assert metadata.split_strategy == "manifest_three_way_split"
        assert len(train) == len(dev) == len(test) == 4

    def test_dev_carved_from_train(self):
        samples = [_utterance(i, speaker=f"spk{i % 6}") for i in range(24)]
        train, dev, test, metadata = split_utterances_three_way(
            samples=samples, settings=_Settings()
        )
        assert metadata.split_strategy.endswith("+dev")
        ids = lambda side: {u.sample_id for u in side}  # noqa: E731
        assert ids(train).isdisjoint(ids(dev))
        assert ids(train).isdisjoint(ids(test))
        assert ids(dev).isdisjoint(ids(test))
        assert len(train) + len(dev) + len(test) == 24


class TestSpeakerScoping:
    def test_explicit_speaker_wins(self):
        utterance = _utterance(0, speaker="given")
        assert resolve_corpus_scoped_speaker_id(utterance) == "given"

    def test_ravdess_filename_fallback_is_corpus_scoped(self):
        utterance = Utterance(
            sample_id="x",
            corpus="ravdess",
            audio_path="/d/03-01-06-01-02-01-12.wav",
            label="happy",
        )
        assert resolve_corpus_scoped_speaker_id(utterance) == "ravdess:12"

    def test_non_ravdess_without_speaker_is_none(self):
        utterance = _utterance(0, corpus="crema-d")
        assert resolve_corpus_scoped_speaker_id(utterance) is None
