"""Resumable checksum-verified fetch over file:// (zero-egress testable)."""

from hashlib import sha256

import pytest

from ser_tpu._internal.data import downloads


def _source(tmp_path, payload: bytes):
    src = tmp_path / "source.bin"
    src.write_bytes(payload)
    return src, f"file://{src}", sha256(payload).hexdigest()


def test_fetch_full_file_with_checksum(tmp_path):
    _, url, digest = _source(tmp_path, b"a" * 4096 + b"b" * 4096)
    dest = tmp_path / "out" / "archive.bin"
    result = downloads.fetch_url(url, dest, expected_sha256=digest)
    assert result.bytes_fetched == 8192
    assert not result.resumed
    assert result.sha256 == digest
    assert dest.read_bytes() == b"a" * 4096 + b"b" * 4096
    assert not dest.with_name(dest.name + ".part").exists()


def test_fetch_resumes_from_partial_staging(tmp_path):
    payload = bytes(range(256)) * 64
    _, url, digest = _source(tmp_path, payload)
    dest = tmp_path / "archive.bin"
    staging = dest.with_name(dest.name + ".part")
    staging.write_bytes(payload[:1000])  # an interrupted earlier attempt
    result = downloads.fetch_url(url, dest, expected_sha256=digest)
    assert result.resumed
    assert result.bytes_fetched == len(payload) - 1000
    assert dest.read_bytes() == payload


def test_checksum_mismatch_discards_and_raises(tmp_path):
    _, url, _ = _source(tmp_path, b"payload")
    dest = tmp_path / "archive.bin"
    with pytest.raises(downloads.ChecksumMismatchError, match="retry"):
        downloads.fetch_url(url, dest, expected_sha256="0" * 64)
    assert not dest.exists()
    assert not dest.with_name(dest.name + ".part").exists()


def test_existing_verified_destination_is_not_refetched(tmp_path):
    payload = b"cached already"
    _, url, digest = _source(tmp_path, payload)
    dest = tmp_path / "archive.bin"
    dest.write_bytes(payload)
    result = downloads.fetch_url(url, dest, expected_sha256=digest)
    assert result.bytes_fetched == 0


def test_corrupt_existing_destination_is_refetched(tmp_path):
    payload = b"the real content"
    _, url, digest = _source(tmp_path, payload)
    dest = tmp_path / "archive.bin"
    dest.write_bytes(b"corrupted")
    result = downloads.fetch_url(url, dest, expected_sha256=digest)
    assert dest.read_bytes() == payload
    assert result.sha256 == digest


def test_unsupported_scheme_raises(tmp_path):
    with pytest.raises(ValueError, match="scheme"):
        downloads.fetch_url("ftp://host/x", tmp_path / "x")


def test_fetch_and_materialize_extracts_archive(tmp_path):
    import zipfile

    archive = tmp_path / "bundle.zip"
    with zipfile.ZipFile(archive, "w") as zf:
        zf.writestr("clips/a.wav", b"RIFFxxxx")
    url = f"file://{archive}"
    root = downloads.fetch_and_materialize(
        dataset_id="mesd",
        url=url,
        destination=tmp_path / "dataset",
        expected_sha256=sha256(archive.read_bytes()).hexdigest(),
        archive_dir=tmp_path / "downloads",
    )
    assert (root / "clips" / "a.wav").exists()
