"""Pure provider-resolution parity: payload parsing, URL ladders, pointers."""

from pathlib import Path

import pytest

from ser_tpu._internal.data import provider_resolution as res


class TestZenodo:
    def test_md5_token_parsing(self):
        assert res.parse_zenodo_md5("md5:abc123") == "abc123"
        assert res.parse_zenodo_md5("MD5: DEF456 ") == "def456"
        assert res.parse_zenodo_md5("sha256:abc") is None
        assert res.parse_zenodo_md5("md5:") is None
        assert res.parse_zenodo_md5(None) is None

    def test_select_file_resolves_url_md5_size(self):
        payload = {
            "files": [
                {"key": "other.zip", "links": {"self": "https://x/other"}},
                {
                    "key": "audio.zip",
                    "links": {"self": "https://zenodo.org/api/files/audio.zip"},
                    "checksum": "md5:0123456789abcdef",
                    "size": 42,
                },
            ]
        }
        meta = res.select_zenodo_file(payload, "audio.zip")
        assert meta.url.endswith("audio.zip")
        assert meta.md5 == "0123456789abcdef"
        assert meta.size == 42

    @pytest.mark.parametrize(
        "payload",
        [
            "not-a-dict",
            {},
            {"files": "nope"},
            {"files": [{"key": "audio.zip"}]},  # no links
            {"files": [{"key": "audio.zip", "links": {"self": ""}}]},  # empty url
        ],
    )
    def test_strict_shape_checks_raise(self, payload):
        with pytest.raises(RuntimeError):
            res.select_zenodo_file(payload, "audio.zip")

    def test_missing_key_raises_with_key_name(self):
        with pytest.raises(RuntimeError, match="missing.zip"):
            res.select_zenodo_file({"files": []}, "missing.zip")


class TestOpenSlr:
    def test_pinned_artifacts_cover_catalog_corpora(self):
        att_hack = res.resolve_openslr_pinned_artifacts("88", (".tgz",))
        assert [a.file_name for a in att_hack] == ["wav.tgz", "txt.tgz"]
        # Four ordered mirrors per artifact, canonical host first.
        assert att_hack[0].urls[0] == "https://openslr.org/resources/88/wav.tgz"
        assert len(att_hack[0].urls) == 4
        emov = res.resolve_openslr_pinned_artifacts("115", (".tar.gz", ".tgz"))
        assert len(emov) == 18  # the 18 EmoV-DB speaker/emotion archives

    def test_pinned_suffix_filter_and_unknown_id(self):
        assert res.resolve_openslr_pinned_artifacts("88", (".zip",)) == ()
        assert res.resolve_openslr_pinned_artifacts("999", (".tgz",)) == ()

    def test_hf_script_resources_extraction(self):
        script = (
            "_BASE = 1\n"
            "_RESOURCES = {'SLR88': {'Files': ['wav.tgz', ' txt.tgz ', 3]},"
            " 'SLR115': {'Files': ['a.tar.gz']}}\n"
        )
        assert res.extract_openslr_files_from_hf_script(script, "88") == ["wav.tgz", "txt.tgz"]
        assert res.extract_openslr_files_from_hf_script(script, "1") == []
        assert res.extract_openslr_files_from_hf_script("x = 1\n", "88") == []

    def test_canonical_urls_dedupe_and_filter(self):
        urls = res.build_canonical_archive_urls(
            "88", ["wav.tgz", "notes.txt", "wav.tgz"], (".tgz",)
        )
        assert urls == ["https://openslr.org/resources/88/wav.tgz"]

    def test_listing_html_extraction_joins_relative_hrefs(self):
        html = (
            '<a href="wav.tgz">wav</a> <A HREF=\'/resources/88/txt.tgz\'>txt</A>'
            ' <a href="readme.html">no</a> <a href="ftp://x/y.tgz">scheme</a>'
            ' <a href="wav.tgz">dupe</a>'
        )
        urls = res.extract_archive_urls_from_listing_html(
            "https://openslr.org/resources/88/", html, (".tgz",)
        )
        assert urls == [
            "https://openslr.org/resources/88/wav.tgz",
            "https://openslr.org/resources/88/txt.tgz",
        ]


class TestGitHub:
    def test_release_asset_parsing(self):
        payload = {
            "tag_name": " v1.2 ",
            "assets": [
                {"name": "data.zip", "browser_download_url": "https://gh/data.zip", "size": 7},
                {"name": "", "browser_download_url": "https://gh/skip"},
                {"name": "no-url"},
                "junk",
            ],
        }
        tag, assets = res.parse_github_release_assets(payload, owner="o", repo="r")
        assert tag == "v1.2"
        assert [(a.key, a.size) for a in assets] == [("data.zip", 7)]

    @pytest.mark.parametrize(
        "payload",
        [None, {}, {"tag_name": "v1"}, {"tag_name": "v1", "assets": []}],
    )
    def test_release_shape_errors(self, payload):
        with pytest.raises(RuntimeError):
            res.parse_github_release_assets(payload, owner="o", repo="r")


class TestGitLfs:
    POINTER = (
        "version https://git-lfs.github.com/spec/v1\n"
        "oid sha256:" + "a" * 64 + "\n"
        "size 1234\n"
    )

    def test_pointer_parse(self):
        pointer = res.parse_lfs_pointer(self.POINTER)
        assert pointer.oid_sha256 == "a" * 64
        assert pointer.size == 1234

    def test_pointer_parse_rejects_malformed(self):
        with pytest.raises(ValueError):
            res.parse_lfs_pointer("RIFF....WAVE")
        with pytest.raises(ValueError):
            res.parse_lfs_pointer("version https://git-lfs.github.com/spec/v1\nsize 3\n")

    def test_tree_scan_finds_only_pointer_audio(self, tmp_path):
        (tmp_path / "real.wav").write_bytes(b"RIFF" + b"\x00" * 64)
        (tmp_path / "stub.wav").write_text(self.POINTER)
        (tmp_path / "notes.txt").write_text(self.POINTER)  # non-audio: ignored
        pointers = res.scan_tree_for_lfs_pointers(tmp_path)
        assert [p.name for p in pointers] == ["stub.wav"]


class TestMendeley:
    def test_folder_paths_nested_and_sanitized(self):
        folders = [
            {"id": "f1", "name": "Audio Files!"},
            {"id": "f2", "name": "angry/loud", "parent_id": "f1"},
            {"id": "f3", "name": "   ", "parent_id": "missing"},
        ]
        paths = res.build_mendeley_folder_paths(folders)
        assert paths["f1"] == Path("Audio_Files")
        assert paths["f2"] == Path("Audio_Files/angry_loud")
        assert paths["f3"] == Path("f3")  # empty name falls back to the id

    def test_folder_cycle_detection(self):
        folders = [
            {"id": "a", "name": "a", "parent_id": "b"},
            {"id": "b", "name": "b", "parent_id": "a"},
        ]
        with pytest.raises(RuntimeError, match="[Cc]ycle"):
            res.build_mendeley_folder_paths(folders)

    def test_file_selection_skips_undownloadable(self):
        payload = [
            {"filename": "a.wav", "content_details": {"download_url": "https://m/a"}, "size": 5},
            {"filename": "", "content_details": {"download_url": "https://m/b"}},
            {"filename": "c.wav"},
            {"filename": "d.wav", "content_details": {}},
            "junk",
        ]
        files = res.select_mendeley_files(payload)
        assert [(f.key, f.size) for f in files] == [("a.wav", 5)]
        with pytest.raises(RuntimeError):
            res.select_mendeley_files({"not": "a list"})


class TestJlCorpus:
    def test_index_sanitization(self):
        assert res.sanitize_jl_corpus_index(" 42 ") == "42"
        assert res.sanitize_jl_corpus_index("../42") is None
        assert res.sanitize_jl_corpus_index("") is None

    def test_audio_src_extraction(self):
        assert res.extract_jl_corpus_audio_src([{"src": " https://x/a.wav "}]) == "https://x/a.wav"
        assert res.extract_jl_corpus_audio_src({"src": "https://x/b.wav"}) == "https://x/b.wav"
        assert res.extract_jl_corpus_audio_src([{"type": "audio/wav"}]) is None
        assert res.extract_jl_corpus_audio_src("str") is None
