"""Per-owner unit coverage: the content-addressed embedding cache."""

import numpy as np

from ser_tpu._internal.data.embedding_cache import EmbeddingCache
from ser_tpu._internal.repr import EncodedSequence


def _sequence(dim=8, frames=5, backend_id="xlsr"):
    rng = np.random.default_rng(0)
    starts = np.arange(frames, dtype=np.float64) * 0.02
    return EncodedSequence(
        embeddings=rng.standard_normal((frames, dim)).astype(np.float32),
        frame_start_seconds=starts,
        frame_end_seconds=starts + 0.02,
        backend_id=backend_id,
    )


def _cache(root, **overrides):
    kwargs = dict(
        root=root,
        backend_id="xlsr",
        model_id="facebook/wav2vec2-xls-r-300m",
        revision="main",
        device="tpu",
        dtype="bfloat16",
    )
    kwargs.update(overrides)
    return EmbeddingCache(**kwargs)


class TestEmbeddingCache:
    def test_roundtrip_by_audio_content(self, tmp_path):
        cache = _cache(tmp_path)
        audio = np.linspace(-1, 1, 1600, dtype=np.float32)
        encoded = _sequence()
        cache.store("clip.wav", encoded, audio=audio)
        loaded = cache.load("clip.wav", audio=audio)
        assert loaded is not None
        np.testing.assert_array_equal(loaded.embeddings, encoded.embeddings)
        np.testing.assert_array_equal(loaded.frame_start_seconds, encoded.frame_start_seconds)
        assert loaded.backend_id == "xlsr"

    def test_content_keying_ignores_file_path(self, tmp_path):
        """Same audio content under a different path must hit."""
        cache = _cache(tmp_path)
        audio = np.ones(320, dtype=np.float32)
        cache.store("a.wav", _sequence(), audio=audio)
        assert cache.load("renamed.wav", audio=audio) is not None

    def test_different_audio_misses(self, tmp_path):
        cache = _cache(tmp_path)
        cache.store("a.wav", _sequence(), audio=np.ones(320, dtype=np.float32))
        assert cache.load("a.wav", audio=np.zeros(320, dtype=np.float32)) is None

    def test_encode_identity_invalidates(self, tmp_path):
        """Any change in backend/model/revision/device/dtype misses."""
        audio = np.ones(320, dtype=np.float32)
        _cache(tmp_path).store("a.wav", _sequence(), audio=audio)
        for change in (
            {"backend_id": "whisper"},
            {"model_id": "other/model"},
            {"revision": "v2"},
            {"device": "cpu"},
            {"dtype": "float32"},
        ):
            assert _cache(tmp_path, **change).load("a.wav", audio=audio) is None

    def test_corrupt_entry_reads_as_miss_and_is_removed(self, tmp_path):
        cache = _cache(tmp_path)
        audio = np.ones(320, dtype=np.float32)
        path = cache.store("a.wav", _sequence(), audio=audio)
        path.write_bytes(b"corrupt zip bytes")
        assert cache.load("a.wav", audio=audio) is None
        assert not path.exists()  # corrupt entry evicted

    def test_file_content_keying_without_decoded_audio(self, tmp_path):
        cache = _cache(tmp_path)
        wav = tmp_path / "raw.wav"
        wav.write_bytes(b"RIFF" + b"\x01" * 64)
        cache.store(str(wav), _sequence())
        assert cache.load(str(wav)) is not None
        wav.write_bytes(b"RIFF" + b"\x02" * 64)  # content changed → miss
        assert cache.load(str(wav)) is None
