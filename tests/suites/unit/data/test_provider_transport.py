"""Transport behavior: retries, integrity checks, file:// paths."""

import json
import urllib.error

import pytest

from ser_tpu._internal.data import provider_transport as transport


class TestRetryPolicy:
    def test_retryable_statuses(self):
        assert transport.is_retryable_http_status(429)
        assert transport.is_retryable_http_status(500)
        assert transport.is_retryable_http_status(599)
        assert not transport.is_retryable_http_status(404)
        assert not transport.is_retryable_http_status(403)

    def test_retries_then_succeeds(self):
        calls = {"n": 0}

        def flaky():
            calls["n"] += 1
            if calls["n"] < 3:
                raise urllib.error.URLError("transient")
            return "ok"

        result = transport.run_with_retries(
            description="flaky", action=flaky, retries=3, sleep=lambda _s: None
        )
        assert result == "ok" and calls["n"] == 3

    def test_non_retryable_http_fails_fast(self):
        calls = {"n": 0}

        def forbidden():
            calls["n"] += 1
            raise urllib.error.HTTPError("u", 403, "forbidden", None, None)

        with pytest.raises(transport.TransportError, match="HTTP 403"):
            transport.run_with_retries(
                description="x", action=forbidden, retries=3, sleep=lambda _s: None
            )
        assert calls["n"] == 1

    def test_exhausted_retries_raise_typed_error(self):
        def always():
            raise urllib.error.URLError("down")

        with pytest.raises(transport.TransportError, match="after 2 attempts"):
            transport.run_with_retries(
                description="x", action=always, retries=2, sleep=lambda _s: None
            )


class TestRequests:
    def test_request_json_over_file_url(self, tmp_path):
        payload = {"files": [{"key": "a.zip"}]}
        path = tmp_path / "record.json"
        path.write_text(json.dumps(payload))
        assert transport.request_json(path.as_uri()) == payload

    def test_request_text_over_file_url(self, tmp_path):
        path = tmp_path / "listing.html"
        path.write_text('<a href="wav.tgz">x</a>')
        assert "wav.tgz" in transport.request_text(path.as_uri())


class TestDownloadFile:
    def test_md5_verified_download(self, tmp_path):
        source = tmp_path / "src.bin"
        source.write_bytes(b"payload-bytes")
        md5 = transport.compute_file_md5(source)
        destination = tmp_path / "out" / "dst.bin"
        got = transport.download_file(source.as_uri(), destination, expected_md5=md5)
        assert got.read_bytes() == b"payload-bytes"

    def test_md5_mismatch_deletes_and_raises(self, tmp_path):
        source = tmp_path / "src.bin"
        source.write_bytes(b"payload")
        destination = tmp_path / "dst.bin"
        with pytest.raises(transport.DownloadIntegrityError, match="md5"):
            transport.download_file(source.as_uri(), destination, expected_md5="0" * 32)
        assert not destination.exists()

    def test_size_mismatch_deletes_and_raises(self, tmp_path):
        source = tmp_path / "src.bin"
        source.write_bytes(b"1234")
        destination = tmp_path / "dst.bin"
        with pytest.raises(transport.DownloadIntegrityError, match="size"):
            transport.download_file(source.as_uri(), destination, expected_size=99)
        assert not destination.exists()

    def test_existing_valid_destination_short_circuits(self, tmp_path):
        destination = tmp_path / "dst.bin"
        destination.write_bytes(b"cached")
        md5 = transport.compute_file_md5(destination)
        # Source does not even exist: the valid cache must satisfy the call.
        got = transport.download_file(
            (tmp_path / "missing.bin").as_uri(), destination, expected_md5=md5
        )
        assert got.read_bytes() == b"cached"

    def test_existing_stale_destination_is_refetched(self, tmp_path):
        source = tmp_path / "src.bin"
        source.write_bytes(b"fresh-content")
        destination = tmp_path / "dst.bin"
        destination.write_bytes(b"stale")
        got = transport.download_file(
            source.as_uri(),
            destination,
            expected_md5=transport.compute_file_md5(source),
        )
        assert got.read_bytes() == b"fresh-content"


class TestReviewRegressions:
    def test_zero_byte_destination_is_refetched(self, tmp_path):
        """A 0-byte file (error-page download) must not be returned as the
        corpus artifact forever: download_file re-fetches it even without an
        expected size/md5 (fetch_url's exists-short-circuit would otherwise
        keep it)."""
        source = tmp_path / "src.bin"
        source.write_bytes(b"real-bytes")
        destination = tmp_path / "dst.bin"
        destination.write_bytes(b"")
        got = transport.download_file(source.as_uri(), destination)
        assert got.read_bytes() == b"real-bytes"

    def test_request_json_non_json_body_is_typed(self, tmp_path):
        page = tmp_path / "maintenance.html"
        page.write_text("<html>down for maintenance</html>", encoding="utf-8")
        with pytest.raises(transport.TransportError, match="not JSON"):
            transport.request_json(page.as_uri())


class TestContainedDestination:
    def test_traversal_escape_is_refused(self, tmp_path):
        from ser_tpu._internal.data.provider_prepare import _contained_destination

        root = tmp_path / "dataset"
        root.mkdir()
        with pytest.raises(transport.TransportError, match="escapes"):
            _contained_destination(root, "../../outside.bin")
        with pytest.raises(transport.TransportError, match="escapes"):
            _contained_destination(root, "nested", "../../../outside.bin")
        # Honest relative names stay inside.
        ok = _contained_destination(root, "nested", "file.wav")
        assert ok == root / "nested" / "file.wav"
