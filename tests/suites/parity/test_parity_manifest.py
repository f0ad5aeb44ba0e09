"""Differential parity: manifest wire format + record semantics.

Reference stages: ``ser/_internal/data/manifest.py`` (``Utterance.from_record``
/ ``to_record``, VAD + annotation parsing, validation ladder) and
``manifest_jsonl.py`` (line discipline, sorted-key serialization, duplicate
rejection). The manifests this framework writes must load in the reference
unchanged and vice versa — these tests assert BYTE-equal serialized files and
identical parsed projections on randomized records, plus identical rejection
of malformed input.
"""

from __future__ import annotations

import hashlib
import json
from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ser_tpu._internal.data.manifest import (
    ManifestError,
    Utterance,
    load_manifest_jsonl,
    write_manifest_jsonl,
)
from ser_tpu._internal.data.ontology import LabelOntology

_LABELS = ["neutral", "calm", "happy", "sad", "angry", "fearful", "disgust", "surprised"]
_BASE_DIR = "/corpus/root"


def _ontology() -> LabelOntology:
    return LabelOntology(
        ontology_id="parity_io",
        allowed_labels=frozenset(_LABELS),
        unknown_label_policy="drop",
    )


def _digest(seed: str) -> str:
    return hashlib.sha256(seed.encode()).hexdigest()


_CORPORA = st.sampled_from(["ravdess", "crema-d", "emodb-2.0"])


@st.composite
def _records(draw, index: int = 0):
    corpus = draw(_CORPORA)
    record: dict = {
        "sample_id": f"s{index}-{draw(st.integers(0, 10_000))}",
        "corpus": corpus,
        "audio_path": draw(
            st.sampled_from(
                [f"clips/a{index}.wav", f"/abs/b{index}.wav", f"deep/tree/c{index}.wav"]
            )
        ),
        "label": draw(st.sampled_from(_LABELS)),
        "schema_version": 2,
    }
    if draw(st.booleans()):
        record["raw_label"] = draw(st.sampled_from(["ANG", "HAP", "08", "w"]))
    if draw(st.booleans()):
        record["vad"] = {
            "valence": draw(st.floats(-1, 1, allow_nan=False)),
            "arousal": draw(st.floats(-1, 1, allow_nan=False)),
            "dominance": draw(st.floats(-1, 1, allow_nan=False)),
        }
    if draw(st.booleans()):
        record["speaker_id"] = f"{corpus}:spk{draw(st.integers(0, 30))}"
    if draw(st.booleans()):
        record["session_id"] = f"{corpus}:ses{draw(st.integers(0, 9))}"
    if draw(st.booleans()):
        record["language"] = draw(st.sampled_from(["en", "de", "es", "fr"]))
    if draw(st.booleans()):
        record["split"] = draw(st.sampled_from(["train", "dev", "test", "validation", ""]))
    if draw(st.booleans()):
        record["native_split"] = draw(st.sampled_from(["train", "test", "weird"]))
    if draw(st.booleans()):
        record["start_seconds"] = draw(st.floats(0, 100, allow_nan=False))
        record["duration_seconds"] = draw(st.floats(0.01, 30, allow_nan=False))
    if draw(st.booleans()):
        record["normalized_audio_sha256"] = _digest(f"{index}-{draw(st.integers(0, 99))}")
    if draw(st.booleans()):
        record["dataset_revision"] = draw(st.sampled_from(["r1", "2024.1"]))
        record["dataset_policy_id"] = "policy-x"
        record["dataset_license_id"] = "cc-by-4.0"
    if draw(st.booleans()):
        record["transcript"] = "kids are talking by the door"
    if draw(st.booleans()):
        record["annotations"] = [
            {"target": "emotion", "source": "acted"},
            {"target": "language", "source": "metadata", "confidence": 0.9},
        ]
    if draw(st.booleans()):
        record["source_url"] = "https://example.org/x.zip"
    return record


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_written_manifest_bytes_match_reference(oracle, tmp_path_factory, data):
    n = data.draw(st.integers(min_value=1, max_value=6))
    records = [data.draw(_records(index=i)) for i in range(n)]
    expected = oracle.call(
        "manifest_roundtrip", records=records, base_dir=_BASE_DIR, labels=_LABELS
    )
    ours = [
        Utterance.from_record(dict(record), base_dir=Path(_BASE_DIR), ontology=_ontology())
        for record in records
    ]
    tmp_path = tmp_path_factory.mktemp("manifest")
    target = tmp_path / "m.jsonl"
    write_manifest_jsonl(ours, target, base_dir=Path(_BASE_DIR), ontology=_ontology())
    assert target.read_text(encoding="utf-8") == expected["text"]
    assert [u.to_record() for u in ours] == expected["projections"]
    assert [str(u.audio_path) for u in ours] == expected["audio_paths"]


@settings(max_examples=15, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(st.data())
def test_cross_loading_matches_both_directions(oracle, tmp_path_factory, data):
    n = data.draw(st.integers(min_value=1, max_value=5))
    records = [data.draw(_records(index=i)) for i in range(n)]
    reference = oracle.call(
        "manifest_roundtrip", records=records, base_dir=_BASE_DIR, labels=_LABELS
    )

    # Reference-written file → our loader.
    tmp_path = tmp_path_factory.mktemp("cross")
    source = tmp_path / "ref.jsonl"
    source.write_text(reference["text"], encoding="utf-8")
    ours = load_manifest_jsonl(
        source, ontology=_ontology(), base_dir=Path(_BASE_DIR)
    )
    assert [u.to_record() for u in ours] == reference["projections"]

    # Our-written file → reference loader.
    target = tmp_path / "ours.jsonl"
    write_manifest_jsonl(ours, target, base_dir=Path(_BASE_DIR), ontology=_ontology())
    reloaded = oracle.call(
        "manifest_load",
        text=target.read_text(encoding="utf-8"),
        base_dir=_BASE_DIR,
        labels=_LABELS,
    )
    assert reloaded["projections"] == reference["projections"]


_BAD_RECORDS = [
    ("missing_sample_id", {"corpus": "ravdess", "audio_path": "a.wav", "label": "happy"}),
    ("missing_corpus", {"sample_id": "s", "audio_path": "a.wav", "label": "happy"}),
    ("missing_path", {"sample_id": "s", "corpus": "ravdess", "label": "happy"}),
    (
        "bad_schema_version",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 7},
    ),
    (
        "bool_schema_version",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": True},
    ),
    (
        "v1_without_label",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "schema_version": 1},
    ),
    (
        "v2_without_targets",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "schema_version": 2},
    ),
    (
        "unknown_label",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "ecstatic",
         "schema_version": 2},
    ),
    (
        "vad_not_object",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2, "vad": [1, 2, 3]},
    ),
    (
        "vad_out_of_range",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2,
         "vad": {"valence": 2.0, "arousal": 0.0, "dominance": 0.0}},
    ),
    (
        "unscoped_speaker",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2, "speaker_id": "01"},
    ),
    (
        "bad_annotation_target",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2, "annotations": [{"target": "mood", "source": "x"}]},
    ),
    (
        "duplicate_annotation",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2,
         "annotations": [{"target": "emotion", "source": "a"},
                         {"target": "emotion", "source": "b"}]},
    ),
    (
        "bad_sha",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2, "normalized_audio_sha256": "NOTHEX"},
    ),
    (
        "negative_start",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2, "start_seconds": -1.0},
    ),
    (
        "zero_duration",
        {"sample_id": "s", "corpus": "ravdess", "audio_path": "a.wav", "label": "happy",
         "schema_version": 2, "duration_seconds": 0.0},
    ),
]


@pytest.mark.parametrize("name,record", _BAD_RECORDS, ids=[n for n, _ in _BAD_RECORDS])
def test_malformed_records_rejected_by_both(oracle, name, record):
    with pytest.raises(Exception) as reference_err:
        oracle.call(
            "manifest_from_record", record=record, base_dir=_BASE_DIR, labels=_LABELS
        )
    with pytest.raises((ManifestError, ValueError)):
        Utterance.from_record(dict(record), base_dir=Path(_BASE_DIR), ontology=_ontology())
    assert reference_err.value is not None


def test_split_outside_vocabulary_is_nulled_by_both(oracle):
    record = {
        "sample_id": "s",
        "corpus": "ravdess",
        "audio_path": "a.wav",
        "label": "happy",
        "schema_version": 2,
        "split": "validation",
        "native_split": "holdout",
    }
    expected = oracle.call(
        "manifest_from_record", record=record, base_dir=_BASE_DIR, labels=_LABELS
    )
    ours = Utterance.from_record(dict(record), base_dir=Path(_BASE_DIR), ontology=_ontology())
    assert (ours.split, ours.native_split) == (expected["split"], expected["native_split"])
    assert ours.split is None and ours.native_split is None


def test_path_alias_and_relative_resolution_match(oracle):
    for path_value, key in (("rel/a.wav", "path"), ("/abs/a.wav", "audio_path")):
        record = {
            "sample_id": f"s-{key}",
            "corpus": "ravdess",
            "audio_path": None,
            "label": "happy",
            "schema_version": 2,
        }
        record.pop("audio_path")
        record[key] = path_value
        expected = oracle.call(
            "manifest_from_record", record=record, base_dir=_BASE_DIR, labels=_LABELS
        )
        ours = Utterance.from_record(
            dict(record), base_dir=Path(_BASE_DIR), ontology=_ontology()
        )
        assert str(ours.audio_path) == expected["audio_path"]


def test_duplicate_sample_ids_rejected_on_load(oracle, tmp_path):
    line = json.dumps(
        {"sample_id": "dup", "corpus": "ravdess", "audio_path": "a.wav",
         "label": "happy", "schema_version": 2},
        sort_keys=True,
    )
    text = f"# comment line\n\n{line}\n{line}\n"
    with pytest.raises(Exception, match="[Dd]uplicate"):
        oracle.call("manifest_load", text=text, base_dir=_BASE_DIR, labels=_LABELS)
    source = tmp_path / "dup.jsonl"
    source.write_text(text, encoding="utf-8")
    with pytest.raises(ManifestError, match="[Dd]uplicate"):
        load_manifest_jsonl(source, ontology=_ontology(), base_dir=Path(_BASE_DIR))
