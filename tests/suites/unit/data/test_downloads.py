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
