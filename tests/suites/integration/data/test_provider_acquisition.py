"""End-to-end provider acquisition over file:// and local-HTTP fixtures.

Zero-egress proof that the per-provider machinery works: each workflow runs
its complete pipeline (metadata enumeration → verified download → extraction
→ labels.csv → source manifest) against local fixtures, exactly as it would
against the live providers.
"""

import functools
import http.server
import io
import json
import tarfile
import threading
import zipfile
from pathlib import Path

import pytest

from ser_tpu._internal.data import provider_prepare as prep
from ser_tpu._internal.data import provider_resolution as res
from ser_tpu._internal.data.downloads import DatasetDownloadUnavailableError
from ser_tpu._internal.data.provider_transport import (
    ProviderTransport,
    TransportError,
    compute_file_md5,
)

RIFF = b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00\x01\x00\x01\x00" + b"\x00" * 16


def _zip_bytes(members: dict[str, bytes]) -> bytes:
    buffer = io.BytesIO()
    with zipfile.ZipFile(buffer, "w") as archive:
        for name, payload in members.items():
            archive.writestr(name, payload)
    return buffer.getvalue()


def _targz_bytes(members: dict[str, bytes]) -> bytes:
    buffer = io.BytesIO()
    with tarfile.open(fileobj=buffer, mode="w:gz") as archive:
        for name, payload in members.items():
            info = tarfile.TarInfo(name)
            info.size = len(payload)
            archive.addfile(info, io.BytesIO(payload))
    return buffer.getvalue()


def _stage_zenodo_record(tmp_path: Path, record_id: str, files: dict[str, bytes]) -> str:
    """Writes a Zenodo-shaped record JSON + payload files; returns the api base."""
    api_root = tmp_path / "zenodo-api"
    api_root.mkdir(parents=True, exist_ok=True)
    payload_dir = tmp_path / "zenodo-files"
    payload_dir.mkdir(parents=True, exist_ok=True)
    entries = []
    for key, payload in files.items():
        path = payload_dir / key
        path.write_bytes(payload)
        entries.append(
            {
                "key": key,
                "links": {"self": path.as_uri()},
                "checksum": f"md5:{compute_file_md5(path)}",
                "size": len(payload),
            }
        )
    (api_root / record_id).write_text(json.dumps({"files": entries}))
    return api_root.as_uri()


class TestZenodoWorkflows:
    def test_ravdess_full_acquisition(self, tmp_path):
        archive = _zip_bytes(
            {
                "Actor_01/03-01-05-01-01-01-01.wav": RIFF,
                "Actor_02/03-01-03-01-01-01-02.wav": RIFF,
            }
        )
        api_base = _stage_zenodo_record(
            tmp_path, "1188976", {"Audio_Speech_Actors_01-24.zip": archive}
        )
        root = tmp_path / "ravdess"
        artifacts = prep.prepare_ravdess(root, zenodo_api_base=api_base)
        assert artifacts.files_seen == 2
        assert (root / "Actor_01/03-01-05-01-01-01-01.wav").is_file()
        manifest = json.loads(artifacts.source_manifest_path.read_text())
        assert manifest["source"]["record_id"] == "1188976"
        # Idempotent: the extraction marker short-circuits a second run.
        again = prep.prepare_ravdess(root, zenodo_api_base=api_base)
        assert again.files_seen == 2

    def test_cafe_tree_labels_from_path_tokens(self, tmp_path):
        archive1 = _zip_bytes({"colere/sp1-colere-1.wav": RIFF})
        archive2 = _zip_bytes({"joie/sp1-joie-1.wav": RIFF, "misc/unknown-1.wav": RIFF})
        api_base = _stage_zenodo_record(
            tmp_path, "1478765", {"CaFE_192k_1.zip": archive1, "CaFE_192k_2.zip": archive2}
        )
        root = tmp_path / "cafe"
        artifacts = prep.prepare_cafe(root, zenodo_api_base=api_base)
        labels = artifacts.labels_csv_path.read_text().splitlines()
        assert labels[0] == "FileName,emotion"
        assert any("colere" in line and "angry" in line for line in labels)
        assert any("joie" in line and "happy" in line for line in labels)
        assert artifacts.files_seen == 3 and artifacts.labels_written == 2

    def test_emodb_metadata_csv_labels(self, tmp_path):
        metadata = (
            "file,emotion\n"
            "03a01Fa,happiness\n"
            "03a01Wa.wav,anger\n"
            "missing,sadness\n"
            "03a02Xx,unknown-emotion\n"
        )
        archive = _zip_bytes(
            {
                "emodb/db.emotion.categories.ambiguous.csv": metadata.encode(),
                "emodb/wav/03a01Fa.wav": RIFF,
                "emodb/wav/03a01Wa.wav": RIFF,
            }
        )
        api_base = _stage_zenodo_record(tmp_path, "17651657", {"emodb_2.0.zip": archive})
        root = tmp_path / "emodb"
        artifacts = prep.prepare_emodb_2(root, zenodo_api_base=api_base)
        content = artifacts.labels_csv_path.read_text()
        assert "happy" in content and "angry" in content
        assert artifacts.labels_written == 2  # missing audio + unknown label drop

    def test_meacorpus_metadata_only_distribution(self, tmp_path):
        metadata = "filename,label\nclip1.wav,joy\nclip2.wav,anger\nabsent.wav,fear\n"
        api_base = _stage_zenodo_record(
            tmp_path, "18606423", {"spanish-meacorpus-2023-dataset.csv": metadata.encode()}
        )
        root = tmp_path / "meacorpus"
        staged = root / "raw" / "spanish-meacorpus-2023"
        staged.mkdir(parents=True)
        (staged / "clip1.wav").write_bytes(RIFF)
        (staged / "clip2.wav").write_bytes(RIFF)
        artifacts = prep.prepare_spanish_meacorpus_2023(root, zenodo_api_base=api_base)
        content = artifacts.labels_csv_path.read_text()
        assert "happy" in content and "angry" in content and "fear" not in content
        assert artifacts.labels_written == 2

    def test_corrupt_archive_md5_fails_typed(self, tmp_path):
        api_base = _stage_zenodo_record(tmp_path, "7132783", {"ASVP-ESD-Update.zip": b"x"})
        # Same-size tamper after the digest was recorded: only md5 can catch it
        # (size is verified first, matching the reference's check order).
        (tmp_path / "zenodo-files" / "ASVP-ESD-Update.zip").write_bytes(b"y")
        with pytest.raises(ValueError, match="md5"):
            prep.prepare_asvp_esd(tmp_path / "asvp", zenodo_api_base=api_base)


class TestOpenSlrWorkflows:
    @pytest.fixture()
    def http_fixture(self, tmp_path):
        """Local HTTP server over a fixture tree — real sockets, zero egress."""
        docroot = tmp_path / "www"
        docroot.mkdir()
        handler = functools.partial(
            http.server.SimpleHTTPRequestHandler, directory=str(docroot)
        )
        server = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        thread = threading.Thread(target=server.serve_forever, daemon=True)
        thread.start()
        try:
            yield docroot, f"http://127.0.0.1:{server.server_address[1]}"
        finally:
            server.shutdown()
            thread.join(timeout=5)

    def test_att_hack_pinned_mirror_ladder_with_fallback(self, tmp_path, http_fixture):
        docroot, base = http_fixture
        # Serve only under the SECOND mirror path shape: the canonical-first
        # attempt 404s, and the ladder must fall through to the next mirror.
        served = docroot / "resources" / "88"
        served.mkdir(parents=True)
        (served / "wav.tgz").write_bytes(_targz_bytes({"wav/sp1_friendly_01.wav": RIFF}))
        (served / "txt.tgz").write_bytes(_targz_bytes({"txt/readme.txt": b"doc"}))

        import unittest.mock as mock

        dead = "http://127.0.0.1:9/resources/{dataset_id}/{file_name}"  # refused port
        live = base + "/resources/{dataset_id}/{file_name}"
        with mock.patch.object(res, "OPENSLR_MIRROR_TEMPLATES", (dead, live)):
            artifacts = prep.prepare_att_hack(tmp_path / "att-hack")
        assert artifacts.labels_written == 1
        assert "friendly" in artifacts.labels_csv_path.read_text()

    def test_listing_html_fallback_for_unpinned_id(self, tmp_path, http_fixture):
        docroot, base = http_fixture
        served = docroot / "resources" / "42"
        served.mkdir(parents=True)
        (served / "angry_set.tgz").write_bytes(_targz_bytes({"angry/a1.wav": RIFF}))
        (served / "index.html").write_text('<a href="angry_set.tgz">set</a>')
        artifacts = prep._openslr_preparer(
            dataset_root=tmp_path / "slr42",
            dataset_id="42",
            archive_suffixes=(".tgz",),
            extract_dir="slr42",
            resolver=prep._token_resolver,
            extensions=frozenset({".wav"}),
            transport=ProviderTransport(),
            hf_script_url=base + "/missing-script.py",  # 404 → ladder continues
            listing_url=base + "/resources/42/index.html",
            canonical_base=base + "/resources",
        )
        assert artifacts.labels_written == 1

    def test_hf_script_resolution_rung(self, tmp_path, http_fixture):
        docroot, base = http_fixture
        served = docroot / "resources" / "7"
        served.mkdir(parents=True)
        (served / "sad_clips.tgz").write_bytes(_targz_bytes({"sad/s1.wav": RIFF}))
        (docroot / "openslr.py").write_text(
            "_RESOURCES = {'SLR7': {'Files': ['sad_clips.tgz']}}\n"
        )
        artifacts = prep._openslr_preparer(
            dataset_root=tmp_path / "slr7",
            dataset_id="7",
            archive_suffixes=(".tgz",),
            extract_dir="slr7",
            resolver=prep._token_resolver,
            extensions=frozenset({".wav"}),
            transport=ProviderTransport(),
            hf_script_url=base + "/openslr.py",
            listing_url=None,
            canonical_base=base + "/resources",
        )
        assert artifacts.labels_written == 1


class TestMendeleyWorkflow:
    def test_mesd_folder_tree_walk(self, tmp_path):
        payload_dir = tmp_path / "mendeley-files"
        payload_dir.mkdir()
        clip = payload_dir / "Anger_1_A.wav"
        clip.write_bytes(RIFF)
        folders = [{"id": "f1", "name": "Mexican Emotional Speech"}]
        files_by_folder = {
            "root": [],
            "f1": [
                {
                    "filename": "Anger_1_A.wav",
                    "size": len(RIFF),
                    "content_details": {"download_url": clip.as_uri()},
                }
            ],
        }

        def fake_request_json(url, **_kwargs):
            if "/folders/" in url:
                return folders
            folder_id = url.split("folder_id=")[1].split("&")[0]
            return files_by_folder[folder_id]

        transport = ProviderTransport(request_json=fake_request_json)
        artifacts = prep.prepare_mesd(tmp_path / "mesd", transport=transport)
        assert artifacts.labels_written == 1
        content = artifacts.labels_csv_path.read_text()
        assert "angry" in content and "Mexican_Emotional_Speech" in content


class TestGitHubReleaseWorkflow:
    def test_pavoque_release_assets(self, tmp_path):
        payload_dir = tmp_path / "gh"
        payload_dir.mkdir()
        asset = payload_dir / "pavoque.tar.gz"
        asset.write_bytes(_targz_bytes({"pavoque/angry/a1.wav": RIFF}))
        release = payload_dir / "release.json"
        release.write_text(
            json.dumps(
                {
                    "tag_name": "v2.0",
                    "assets": [
                        {
                            "name": "pavoque.tar.gz",
                            "browser_download_url": asset.as_uri(),
                            "size": asset.stat().st_size,
                        }
                    ],
                }
            )
        )
        artifacts = prep.prepare_pavoque(tmp_path / "pavoque", release_url=release.as_uri())
        assert artifacts.labels_written == 1
        manifest = json.loads(artifacts.source_manifest_path.read_text())
        assert manifest["source"]["tag"] == "v2.0"


class TestJlCorpusWorkflow:
    def test_hf_rows_fallback_without_kaggle_credentials(self, tmp_path, monkeypatch):
        monkeypatch.delenv("KAGGLE_USERNAME", raising=False)
        monkeypatch.delenv("KAGGLE_KEY", raising=False)
        payload_dir = tmp_path / "hf"
        payload_dir.mkdir()
        clip = payload_dir / "female1_angry_1a_1.wav"
        clip.write_bytes(RIFF)
        pages = {
            0: {
                "rows": [
                    {
                        "row_idx": 0,
                        "row": {
                            "file_name": "female1_angry_1a_1.wav",
                            "audio": [{"src": clip.as_uri(), "type": "audio/wav"}],
                        },
                    }
                ]
            },
            100: {"rows": []},
        }

        def fake_request_json(url, **_kwargs):
            offset = int(url.split("offset=")[1].split("&")[0])
            return pages[offset]

        transport = ProviderTransport(request_json=fake_request_json)
        artifacts = prep.prepare_jl_corpus(tmp_path / "jl", transport=transport)
        assert artifacts.labels_written == 1
        manifest = json.loads(artifacts.source_manifest_path.read_text())
        assert manifest["source"]["provider"] == "huggingface-rows"


class TestCremaDValidation:
    POINTER = (
        "version https://git-lfs.github.com/spec/v1\n"
        "oid sha256:" + "b" * 64 + "\nsize 9\n"
    )

    def test_pointer_stubs_fail_with_lfs_hint(self, tmp_path):
        root = tmp_path / "crema-d"
        (root / "AudioWAV").mkdir(parents=True)
        (root / "AudioWAV" / "1001_DFA_ANG_XX.wav").write_text(self.POINTER)
        with pytest.raises(RuntimeError, match="git lfs pull"):
            prep.prepare_crema_d(root)

    def test_materialized_tree_passes(self, tmp_path):
        root = tmp_path / "crema-d"
        (root / "AudioWAV").mkdir(parents=True)
        (root / "AudioWAV" / "1001_DFA_ANG_XX.wav").write_bytes(RIFF)
        artifacts = prep.prepare_crema_d(root)
        assert artifacts.files_seen == 1
        assert artifacts.source_manifest_path.is_file()


class TestDispatch:
    def test_every_catalog_id_has_a_workflow(self):
        from ser_tpu._internal.data.catalog import list_dataset_ids

        assert set(prep.AUTO_PREPARERS) == set(list_dataset_ids())

    def test_unknown_dataset_raises_keyerror(self, tmp_path):
        with pytest.raises(KeyError, match="no-such-corpus"):
            prep.acquire_dataset("no-such-corpus", tmp_path)

    def test_transport_failure_becomes_staging_error(self, tmp_path):
        def dead_request_json(_url, **_kwargs):
            raise TransportError("GET https://zenodo.org failed after 3 attempts.")

        transport = ProviderTransport(request_json=dead_request_json)
        with pytest.raises(DatasetDownloadUnavailableError, match="skip_download=True"):
            prep.acquire_dataset("ravdess", tmp_path / "rv", transport=transport)

    def test_license_gated_corpora_raise_staging_error(self, tmp_path):
        for dataset_id in ("msp-podcast", "biic-podcast"):
            with pytest.raises(DatasetDownloadUnavailableError):
                prep.acquire_dataset(dataset_id, tmp_path / dataset_id)

    def test_prepare_dataset_routes_through_acquisition(self, tmp_path, monkeypatch):
        """prepare_dataset(skip_download=False) acquires, then builds the manifest."""
        archive = _zip_bytes({"Actor_01/03-01-05-01-01-01-01.wav": RIFF})
        api_base = _stage_zenodo_record(
            tmp_path, "1188976", {"Audio_Speech_Actors_01-24.zip": archive}
        )
        monkeypatch.setitem(
            prep.AUTO_PREPARERS,
            "ravdess",
            functools.partial(prep.prepare_ravdess, zenodo_api_base=api_base),
        )
        from ser_tpu._internal.config.bootstrap import reload_settings
        from ser_tpu._internal.data.prepare import prepare_dataset

        monkeypatch.setenv("SER_DATASETS_ROOT", str(tmp_path / "registry"))
        result = prepare_dataset(
            dataset_id="ravdess",
            dataset_root=tmp_path / "acquired",
            skip_download=False,
            settings=reload_settings(),
        )
        assert result.utterance_count == 1
        assert Path(result.manifest_path).is_file()


class TestAcquisitionRetryAndSentinel:
    def test_acquire_writes_completion_marker(self, tmp_path):
        from ser_tpu._internal.data.downloads import MATERIALIZED_SENTINEL

        archive = _zip_bytes({"Actor_01/03-01-05-01-01-01-01.wav": RIFF})
        api_base = _stage_zenodo_record(
            tmp_path, "1188976", {"Audio_Speech_Actors_01-24.zip": archive}
        )
        root = tmp_path / "ravdess"
        prep.acquire_dataset("ravdess", root, zenodo_api_base=api_base)
        # Without the marker, materialize_dataset treats an acquired tree as
        # an interrupted extraction (rmtree) and prepare_dataset as already
        # acquired (no retry) — both wrong.
        assert (root / MATERIALIZED_SENTINEL).read_text().strip() == "ravdess"

    def test_failed_acquisition_leaves_retryable_root(self, tmp_path):
        """A preparer mkdirs the root before its first network call; the
        empty residue of a failed attempt must not disable retry."""
        from ser_tpu._internal.data.downloads import DatasetDownloadUnavailableError

        def dead_request_json(_url, **_kwargs):
            raise TransportError("network down")

        dead = ProviderTransport(request_json=dead_request_json)
        root = tmp_path / "ravdess"
        with pytest.raises(DatasetDownloadUnavailableError):
            prep.acquire_dataset("ravdess", root, transport=dead)
        # The gate prepare_dataset uses: an empty root counts as unacquired.
        assert not root.exists() or not any(root.iterdir())

    def test_jl_duplicate_basenames_do_not_mislabel(self, tmp_path):
        """Two HF rows exposing the same file name must yield two labeled
        files, not one file with the second row's label."""
        import json as _json

        audio_src = tmp_path / "audio1.bin"
        audio_src.write_bytes(RIFF)
        audio_src2 = tmp_path / "audio2.bin"
        audio_src2.write_bytes(RIFF + b"x")
        rows = {
            "rows": [
                {
                    "row_idx": 0,
                    "row": {
                        "file_name": "male1_angry_1a_1.wav",
                        "audio": [{"src": audio_src.as_uri()}],
                    },
                },
                {
                    "row_idx": 1,
                    "row": {
                        "file_name": "male1_angry_1a_1.wav",
                        "audio": [{"src": audio_src2.as_uri()}],
                    },
                },
            ],
            "num_rows_total": 2,
        }
        payload_path = tmp_path / "rows.json"
        payload_path.write_text(_json.dumps(rows), encoding="utf-8")
        seen = {"n": 0}

        def rows_json(_url, **_kwargs):
            if seen["n"]:
                return {"rows": [], "num_rows_total": 2}
            seen["n"] += 1
            return rows

        transport = ProviderTransport(request_json=rows_json)
        labels_csv = tmp_path / "labels.csv"
        stats = prep.download_jl_corpus_via_hf_rows(
            dataset_root=tmp_path,
            labels_csv_path=labels_csv,
            transport=transport,
        )
        assert stats.labels_written == 2
        audio_root = tmp_path / "raw" / "jl-corpus"
        labeled_files = sorted(p.name for p in audio_root.iterdir())
        assert len(labeled_files) == 2
