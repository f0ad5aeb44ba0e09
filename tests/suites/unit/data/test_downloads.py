"""Provider registry + archive materialization tests."""

import tarfile
import zipfile

import pytest

from ser_tpu._internal.data.downloads import (
    ArchiveError,
    DatasetDownloadUnavailableError,
    PROVIDERS,
    extract_archive,
    fetch_from_provider,
    materialize_dataset,
)


def test_provider_registry_covers_catalog_providers():
    from ser_tpu._internal.data.catalog import DATASET_CATALOG

    catalog_providers = {spec.provider for spec in DATASET_CATALOG.values()}
    assert catalog_providers <= set(PROVIDERS)


def test_fetch_always_raises_with_guidance():
    with pytest.raises(DatasetDownloadUnavailableError, match="zenodo"):
        fetch_from_provider("zenodo")


def test_zip_extraction(tmp_path):
    archive = tmp_path / "d.zip"
    with zipfile.ZipFile(archive, "w") as handle:
        handle.writestr("Actor_01/clip.wav", b"RIFF")
    members = extract_archive(archive, tmp_path / "out")
    assert members == ["Actor_01/clip.wav"]
    assert (tmp_path / "out" / "Actor_01" / "clip.wav").read_bytes() == b"RIFF"


def test_tar_extraction(tmp_path):
    archive = tmp_path / "d.tar.gz"
    payload = tmp_path / "x.txt"
    payload.write_text("hello")
    with tarfile.open(archive, "w:gz") as handle:
        handle.add(payload, arcname="data/x.txt")
    members = extract_archive(archive, tmp_path / "out")
    assert "data/x.txt" in members


def test_traversal_rejected(tmp_path):
    archive = tmp_path / "evil.zip"
    with zipfile.ZipFile(archive, "w") as handle:
        handle.writestr("../escape.txt", b"nope")
    with pytest.raises(ArchiveError, match="escapes"):
        extract_archive(archive, tmp_path / "out")


def test_materialize_from_staged_archive(tmp_path):
    archive = tmp_path / "ravdess.zip"
    with zipfile.ZipFile(archive, "w") as handle:
        handle.writestr("Actor_01/03-01-01-01-01-01-01.wav", b"RIFF")
    root = materialize_dataset(
        dataset_id="ravdess", archive_path=archive, destination=tmp_path / "ds"
    )
    assert (root / "Actor_01").is_dir()


def test_materialize_without_archive_raises(tmp_path):
    with pytest.raises(DatasetDownloadUnavailableError):
        materialize_dataset(
            dataset_id="ravdess", archive_path=None, destination=tmp_path / "empty"
        )


def test_resume_without_checksum_restarts_from_scratch(tmp_path):
    """A .part can only resume when a digest will vouch for the splice."""
    from ser_tpu._internal.data.downloads import fetch_url

    source = tmp_path / "src.bin"
    source.write_bytes(b"B" * 100)
    destination = tmp_path / "out.bin"
    # Stale partial content that does NOT match the current source.
    (tmp_path / "out.bin.part").write_bytes(b"A" * 40)
    result = fetch_url(source.as_uri(), destination)
    assert result.resumed is False
    assert destination.read_bytes() == b"B" * 100


def test_resume_with_checksum_splices_and_verifies(tmp_path):
    from hashlib import sha256

    from ser_tpu._internal.data.downloads import fetch_url

    payload = b"C" * 100
    source = tmp_path / "src.bin"
    source.write_bytes(payload)
    destination = tmp_path / "out.bin"
    (tmp_path / "out.bin.part").write_bytes(payload[:37])
    result = fetch_url(
        source.as_uri(), destination, expected_sha256=sha256(payload).hexdigest()
    )
    assert result.resumed is True
    assert result.bytes_fetched == 63
    assert destination.read_bytes() == payload


def test_partial_extraction_is_reextracted(tmp_path):
    """A non-empty destination without the completion marker re-extracts;
    with the marker (or with no archive) it is accepted as materialized."""
    import zipfile

    from ser_tpu._internal.data.downloads import (
        MATERIALIZED_SENTINEL,
        materialize_dataset,
    )

    archive = tmp_path / "corpus.zip"
    with zipfile.ZipFile(archive, "w") as handle:
        handle.writestr("a/x.wav", "RIFF")
        handle.writestr("a/y.wav", "RIFF")
    destination = tmp_path / "dataset"
    # Simulate an interrupted extraction: one file, no sentinel.
    (destination / "a").mkdir(parents=True)
    (destination / "a" / "x.wav").write_text("partial")
    root = materialize_dataset(
        dataset_id="mesd", archive_path=archive, destination=destination
    )
    assert (root / "a" / "y.wav").exists()
    assert (root / MATERIALIZED_SENTINEL).exists()
    # Operator-staged tree (no archive): accepted as-is even without marker.
    staged = tmp_path / "staged"
    (staged / "b").mkdir(parents=True)
    (staged / "b" / "z.wav").write_text("RIFF")
    assert (
        materialize_dataset(dataset_id="mesd", archive_path=None, destination=staged)
        == staged
    )


def test_sibling_prefix_member_rejected(tmp_path):
    from ser_tpu._internal.data.downloads import ArchiveError, _safe_members

    destination = tmp_path / "mesd"
    destination.mkdir()
    (tmp_path / "mesd-evil").mkdir()
    with pytest.raises(ArchiveError, match="escapes"):
        _safe_members(["../mesd-evil/x.wav"], destination)


def test_registry_survives_malformed_entries(tmp_path):
    """A hand-corrupted registry entry surfaces as a skipped record, not an
    AttributeError crashing the health audit that reports corruption."""
    import dataclasses
    import json

    from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
    from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
    from ser_tpu._internal.data import registry

    settings = build_settings_from_inputs(capture_settings_inputs(env={}))
    settings = dataclasses.replace(
        settings, dataset=dataclasses.replace(settings.dataset, registry_root=tmp_path)
    )
    registry.register_dataset(
        registry.DatasetRegistryRecord(
            dataset_id="good",
            dataset_root=str(tmp_path),
            manifest_path=str(tmp_path / "m.jsonl"),
            utterance_count=3,
        ),
        settings=settings,
    )
    raw = json.loads((tmp_path / "datasets.json").read_text())
    raw["broken"] = "oops"
    raw["badcount"] = {"dataset_root": str(tmp_path), "manifest_path": "x", "utterance_count": "many"}
    (tmp_path / "datasets.json").write_text(json.dumps(raw))
    records = registry.list_registered_datasets(settings=settings)
    ids = [r.dataset_id for r in records]
    assert "good" in ids and "broken" not in ids
    assert next(r for r in records if r.dataset_id == "badcount").utterance_count == -1
    # Health audit runs to completion over the same registry.
    registry.audit_registry_health(settings=settings)


def test_manifest_write_is_atomic_on_invalid_record(tmp_path):
    import pytest

    from ser_tpu._internal.data.manifest import (
        ManifestError,
        Utterance,
        read_manifest_jsonl,
        write_manifest_jsonl,
    )

    good = Utterance(
        sample_id="a", corpus="ravdess", audio_path="/d/a.wav",
        label="happy", raw_label="03", language="en",
    )
    target = tmp_path / "m.jsonl"
    write_manifest_jsonl([good], target)
    bad = Utterance(
        sample_id="b", corpus="ravdess", audio_path="/d/b.wav",
        label="not-a-label", raw_label="xx", language="en",
    )
    with pytest.raises((ManifestError, ValueError)):
        write_manifest_jsonl([good, bad], target)
    # The previously good manifest survives intact.
    assert [u.sample_id for u in read_manifest_jsonl(target)] == ["a"]
