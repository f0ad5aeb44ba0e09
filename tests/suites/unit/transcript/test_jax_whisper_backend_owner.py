"""Per-owner tests for ``_internal/transcript/jax_whisper_backend.py``.

Behavior spec: reference ``transcript/backends/stable_whisper.py`` (asset
gating, demucs routing before VAD/decode) and ``backends/factory.py``
(adapter contract). The JAX model itself is pinned elsewhere
(``tests/suites/unit/models/test_whisper_decode*.py``); this file owns the
ADAPTER: asset resolution layouts, compatibility blocking, typed errors,
and the separation/denoise routing on the transcribe path.
"""

from __future__ import annotations

import numpy as np
import pytest

from ser_tpu._internal.transcript.base import TranscriptionBackendAdapter
from ser_tpu._internal.transcript.jax_whisper_backend import JaxWhisperTranscriber


def _backend(tmp_path, **kwargs) -> JaxWhisperTranscriber:
    return JaxWhisperTranscriber(
        model_name=kwargs.pop("model_name", "OpenAI/whisper/distil-large-v3"),
        cache_root=kwargs.pop("cache_root", tmp_path),
        **kwargs,
    )


class TestAssetResolution:
    def test_satisfies_adapter_protocol(self, tmp_path):
        assert isinstance(_backend(tmp_path), TranscriptionBackendAdapter)

    def test_missing_assets_not_available(self, tmp_path):
        backend = _backend(tmp_path)
        assert backend.assets_available() is False
        assert backend.setup_required() is True

    def test_plain_layout_resolves(self, tmp_path):
        model_dir = tmp_path / "OpenAI" / "whisper" / "distil-large-v3"
        model_dir.mkdir(parents=True)
        (model_dir / "config.json").write_text("{}")
        assert _backend(tmp_path).assets_available() is True

    def test_double_dash_layout_resolves(self, tmp_path):
        model_dir = tmp_path / "OpenAI--whisper--distil-large-v3"
        model_dir.mkdir(parents=True)
        (model_dir / "config.json").write_text("{}")
        assert _backend(tmp_path).assets_available() is True

    def test_empty_dir_does_not_count_as_assets(self, tmp_path):
        (tmp_path / "OpenAI" / "whisper" / "distil-large-v3").mkdir(parents=True)
        assert _backend(tmp_path).assets_available() is False


class TestCompatibility:
    def test_missing_assets_block(self, tmp_path):
        report = _backend(tmp_path).check_compatibility()
        assert report.blocking is True
        assert any("missing" in issue.message for issue in report.issues)

    def test_staged_assets_clean(self, tmp_path):
        model_dir = tmp_path / "OpenAI" / "whisper" / "distil-large-v3"
        model_dir.mkdir(parents=True)
        (model_dir / "config.json").write_text("{}")
        assert _backend(tmp_path).check_compatibility().blocking is False

    def test_demucs_note_is_informational(self, tmp_path):
        model_dir = tmp_path / "OpenAI" / "whisper" / "distil-large-v3"
        model_dir.mkdir(parents=True)
        (model_dir / "config.json").write_text("{}")
        report = _backend(tmp_path, use_demucs=True).check_compatibility()
        assert report.blocking is False
        assert any(issue.kind == "noise" for issue in report.issues)


class TestTypedErrors:
    def test_prepare_assets_raises_typed_unavailable(self, tmp_path):
        from ser_tpu._internal.transcript.extractor import TranscriptionUnavailableError

        with pytest.raises(TranscriptionUnavailableError, match="staged locally"):
            _backend(tmp_path).prepare_assets()

    def test_load_model_without_assets_raises_typed(self, tmp_path):
        from ser_tpu._internal.transcript.extractor import TranscriptionUnavailableError

        with pytest.raises(TranscriptionUnavailableError):
            _backend(tmp_path).load_model()


class TestSeparationRouting:
    """use_demucs routes audio through separation + spectral gate pre-decode
    (reference stable_whisper.py:272-478 runs demucs before VAD/decoding)."""

    @staticmethod
    def _wav(tmp_path) -> str:
        import wave

        rng = np.random.default_rng(0)
        pcm = (rng.standard_normal(16000) * 3000).astype(np.int16)
        path = tmp_path / "clip.wav"
        with wave.open(str(path), "wb") as handle:
            handle.setnchannels(1)
            handle.setsampwidth(2)
            handle.setframerate(16000)
            handle.writeframes(pcm.tobytes())
        return str(path)

    def test_demucs_lane_runs_separator_then_gate(self, tmp_path, monkeypatch):
        calls: list[str] = []

        import ser_tpu._internal.utils.denoise as denoise_mod
        import ser_tpu._internal.utils.source_separation as separation_mod

        def fake_separate(audio, sr, *, model_path=None):
            calls.append(f"separate:{model_path}")
            return audio

        def fake_gate(audio, **kwargs):
            calls.append("gate")
            return audio

        monkeypatch.setattr(separation_mod, "separate_vocals_auto", fake_separate)
        monkeypatch.setattr(denoise_mod, "spectral_gate_denoise", fake_gate)

        backend = _backend(
            tmp_path,
            use_demucs=True,
            use_vad=False,
            separation_model_path=tmp_path / "sep.npz",
        )

        class _FakeModel:
            @staticmethod
            def transcribe_words(audio, *, language, use_vad):
                calls.append(f"decode:{len(audio)}:{language}:{use_vad}")
                return []

        backend._model = _FakeModel()
        assert backend.transcribe(self._wav(tmp_path), language="en") == []
        # The configured separation checkpoint path is plumbed into the lane.
        assert calls == [
            f"separate:{tmp_path / 'sep.npz'}",
            "gate",
            "decode:16000:en:False",
        ]

    def test_plain_lane_skips_separation(self, tmp_path, monkeypatch):
        calls: list[str] = []

        backend = _backend(tmp_path, use_demucs=False)

        class _FakeModel:
            @staticmethod
            def transcribe_words(audio, *, language, use_vad):
                calls.append("decode")
                return []

        backend._model = _FakeModel()
        backend.transcribe(self._wav(tmp_path), language="en")
        assert calls == ["decode"]

    def test_backend_id(self, tmp_path):
        assert _backend(tmp_path).backend_id == "jax_whisper"
