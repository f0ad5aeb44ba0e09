"""Split-ledger audit: dedupe, identity grouping, determinism, isolation."""

import hashlib

import pytest

from ser_tpu._internal.data.dataset_audit import (
    DatasetAuditError,
    build_split_ledger,
)
from ser_tpu._internal.data.manifest import Utterance


def _utterance(i, *, corpus="ravdess", label="happy", speaker=None, session=None,
               content=None, native_split=None):
    digest = hashlib.sha256((content or f"audio-{i}").encode()).hexdigest()
    return Utterance(
        sample_id=f"s{i:03d}",
        corpus=corpus,
        audio_path=f"/data/{corpus}/s{i:03d}.wav",
        label=label,
        speaker_id=speaker,
        session_id=session,
        normalized_audio_sha256=digest,
        native_split=native_split,
    )


def _balanced_corpus(n_speakers=10, clips_per_speaker=4):
    labels = ("happy", "sad")
    rows = []
    i = 0
    for speaker in range(n_speakers):
        for clip in range(clips_per_speaker):
            rows.append(
                _utterance(i, speaker=f"spk{speaker}", label=labels[clip % 2])
            )
            i += 1
    return rows


class TestLedgerBasics:
    def test_every_row_is_classified_once(self):
        rows = _balanced_corpus()
        report = build_split_ledger(rows)
        assert len(report.ledger) == len(rows)
        assert sum(report.counters.values()) == len(rows)
        assert set(report.counters) <= {"train", "dev", "test", "ssl_only", "quarantined"}

    def test_deterministic_for_fixed_seed(self):
        rows = _balanced_corpus()
        a = build_split_ledger(rows, seed=17)
        b = build_split_ledger(rows, seed=17)
        assert a.ledger == b.ledger
        assert a.ledger_digest == b.ledger_digest
        c = build_split_ledger(rows, seed=18)
        assert c.ledger_digest != a.ledger_digest  # seed changes assignments

    def test_grouped_split_keeps_speakers_intact(self):
        rows = _balanced_corpus()
        report = build_split_ledger(rows)
        by_speaker = {}
        for entry in report.ledger:
            assert entry.group_id is not None
            by_speaker.setdefault(entry.group_id, set()).add(entry.split)
        assert all(len(splits) == 1 for splits in by_speaker.values())
        assert report.counters["train"] > report.counters["test"] > 0

    def test_manifest_digest_tracks_content(self):
        rows = _balanced_corpus()
        a = build_split_ledger(rows)
        rows2 = rows[:-1] + [_utterance(999, speaker="spk0", label="sad")]
        b = build_split_ledger(rows2)
        assert a.manifest_digest != b.manifest_digest


class TestDedupe:
    def test_duplicate_sample_id_is_fatal(self):
        rows = [_utterance(1, speaker="a"), _utterance(1, speaker="b", content="other")]
        with pytest.raises(DatasetAuditError, match="Duplicate sample_id"):
            build_split_ledger(rows)

    def test_duplicate_content_quarantines_both(self):
        rows = _balanced_corpus()
        rows += [
            _utterance(900, speaker="spk0", content="same-bytes"),
            _utterance(901, speaker="spk9", content="same-bytes", label="sad"),
        ]
        report = build_split_ledger(rows)
        assert report.split_of("s900") == "quarantined"
        assert report.split_of("s901") == "quarantined"
        dupes = [e for e in report.ledger if e.split == "quarantined"]
        assert all(e.reason == "duplicate_audio_content" for e in dupes)

    def test_missing_hashes_block_strict_allowed_lenient(self):
        rows = _balanced_corpus()
        import dataclasses

        rows[0] = dataclasses.replace(rows[0], normalized_audio_sha256=None)
        with pytest.raises(DatasetAuditError, match="audio_sha256 is missing"):
            build_split_ledger(rows, strict=True)
        report = build_split_ledger(rows, strict=False)
        assert len(report.ledger) == len(rows)


class TestIdentityGrouping:
    def test_speaker_session_union(self):
        """A speaker seen under two sessions is ONE group (union-find)."""
        rows = [
            _utterance(1, speaker="spkA", session="sess1"),
            _utterance(2, speaker="spkA", session="sess2", label="sad"),
            _utterance(3, speaker="spkB", session="sess2"),
        ]
        # spkA∪sess1, spkA∪sess2, spkB∪sess2 → all three rows share one root.
        report = build_split_ledger(rows, strict=False)
        groups = {entry.group_id for entry in report.ledger}
        assert len(groups) == 1

    def test_groupless_rows_route_to_ssl_only(self):
        rows = _balanced_corpus()
        rows.append(_utterance(800, label="happy"))  # no speaker/session
        report = build_split_ledger(rows)
        assert report.split_of("s800") == "ssl_only"
        entry = next(e for e in report.ledger if e.sample_id == "s800")
        assert entry.reason == "missing_speaker_or_session_group"


class TestNativeSplits:
    def test_verified_native_splits_are_kept(self):
        rows = [
            _utterance(1, corpus="msp", speaker="a", native_split="train"),
            _utterance(2, corpus="msp", speaker="b", native_split="train", label="sad"),
            _utterance(3, corpus="msp", speaker="c", native_split="test"),
            _utterance(4, corpus="msp", speaker="d", native_split="dev", label="sad"),
        ]
        report = build_split_ledger(rows)
        assert report.split_of("s001") == "train"
        assert report.split_of("s003") == "test"
        assert all(
            e.reason == "verified_native_split" for e in report.ledger
        )

    def test_partially_native_corpus_falls_back_to_grouped(self):
        rows = _balanced_corpus()
        import dataclasses

        rows[0] = dataclasses.replace(rows[0], native_split="train")
        report = build_split_ledger(rows)  # one native row doesn't make it official
        assert any(e.reason == "deterministic_grouped_split" for e in report.ledger)


class TestValidation:
    def test_native_split_leakage_is_fatal(self):
        rows = [
            _utterance(1, corpus="x", speaker="a", native_split="train"),
            _utterance(2, corpus="x", speaker="a", native_split="test", label="sad"),
            _utterance(3, corpus="x", speaker="b", native_split="train", label="sad"),
        ]
        with pytest.raises(DatasetAuditError, match="leakage"):
            build_split_ledger(rows)

    def test_single_class_train_is_fatal_in_strict(self):
        rows = [
            _utterance(i, speaker=f"spk{i}", label="happy") for i in range(6)
        ]
        with pytest.raises(DatasetAuditError, match="two populated classes"):
            build_split_ledger(rows)
        assert build_split_ledger(rows, strict=False).counters["train"] >= 1

    def test_eval_class_missing_from_train_is_fatal(self):
        # Native splits put the ONLY 'sad' clip in test.
        rows = [
            _utterance(1, corpus="x", speaker="a", native_split="train", label="happy"),
            _utterance(2, corpus="x", speaker="b", native_split="train", label="neutral"),
            _utterance(3, corpus="x", speaker="c", native_split="test", label="sad"),
        ]
        with pytest.raises(DatasetAuditError, match="absent from train"):
            build_split_ledger(rows)

    def test_tiny_corpora_degrade_gracefully(self):
        one = [_utterance(1, speaker="a"), _utterance(2, speaker="a", label="sad")]
        report = build_split_ledger(one)
        assert {e.split for e in report.ledger} == {"train"}
        two = [
            _utterance(1, speaker="a"),
            _utterance(2, speaker="b", label="sad"),
            _utterance(3, speaker="a", label="sad"),
        ]
        report2 = build_split_ledger(two, strict=False)
        assert {e.split for e in report2.ledger} == {"train", "test"}


class TestLabelFreeRows:
    def test_strict_class_checks_skip_none_labels(self):
        """Schema-v2 label-free rows (VAD-only) must neither crash the
        eval-coverage join (None unsortable) nor count as a populated class
        in the two-class gate."""
        rows = _balanced_corpus()
        # Label-free rows spread across speakers, some landing in dev/test.
        rows.extend(
            _utterance(900 + k, speaker=f"spk{k}", label=None) for k in range(6)
        )
        report = build_split_ledger(rows, strict=True)
        assert len(report.ledger) == len(rows)

    def test_single_real_class_with_none_still_fails(self):
        import pytest as _pytest

        from ser_tpu._internal.data.dataset_audit import DatasetAuditError

        rows = []
        for speaker in range(10):
            for clip in range(4):
                rows.append(
                    _utterance(
                        speaker * 4 + clip, speaker=f"spk{speaker}", label="happy"
                    )
                )
        rows.extend(
            _utterance(800 + k, speaker=f"spk{k}", label=None) for k in range(4)
        )
        # {None, 'happy'} must NOT pass as two populated classes.
        with _pytest.raises(DatasetAuditError, match="two populated classes"):
            build_split_ledger(rows, strict=True)
