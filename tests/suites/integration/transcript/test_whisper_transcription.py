"""Whisper transcription decode loop through a tiny model + fake tokenizer."""

import numpy as np
import pytest

from ser_tpu.models import whisper as whisper_model


class FakeTokenizer:
    """Deterministic mini-tokenizer covering the decode loop's contract.

    Specials live at fixed ids; 'words' are single ids decoded to w<id>.
    """

    SPECIALS = {
        "<|startoftranscript|>": 200,
        "<|endoftext|>": 201,
        "<|en|>": 202,
        "<|transcribe|>": 203,
        "<|0.00|>": 210,
    }
    unk_token_id = 199

    def convert_tokens_to_ids(self, tokens):
        return [self.SPECIALS.get(token, self.unk_token_id) for token in tokens]

    def decode(self, ids):
        return " ".join(f"w{i}" for i in ids)


@pytest.fixture(scope="module")
def tiny_model():
    import jax

    config = whisper_model.WhisperConfig.tiny()
    encoder_params = whisper_model.init_whisper_encoder_params(config, seed=0)
    decoder = whisper_model.WhisperDecoder(config)
    tokens = np.zeros((1, config.max_target_positions), dtype=np.int32)
    states = np.zeros((1, whisper_model.CHUNK_FRAMES // 2, config.d_model), dtype=np.float32)
    decoder_params = decoder.init(
        jax.random.PRNGKey(0), tokens, states
    )["params"]
    return whisper_model.WhisperForTranscription(
        config, encoder_params, decoder_params, FakeTokenizer()
    )


def test_transcribe_words_runs_and_produces_monotone_timestamps(tiny_model):
    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal(16000 * 2)).astype(np.float32)
    words = tiny_model.transcribe_words(audio, language="en", use_vad=False)
    # Random-weight decode emits arbitrary tokens; the contract is structural:
    for word in words:
        assert word.end_seconds > word.start_seconds
        assert 0.0 <= word.start_seconds <= 2.0 + 1e-6
    starts = [w.start_seconds for w in words]
    assert starts == sorted(starts)


def test_silence_with_vad_yields_empty(tiny_model):
    silence = np.zeros(16000, dtype=np.float32)
    assert tiny_model.transcribe_words(silence, use_vad=True) == []


def test_vad_trims_leading_silence():
    audio = np.zeros(16000, dtype=np.float32)
    audio[8000:12000] = 0.5
    trimmed = whisper_model._trim_silence(audio)
    assert trimmed.size < audio.size
    assert np.abs(trimmed).max() == pytest.approx(0.5)


def test_timestamp_token_segmentation(tiny_model, monkeypatch):
    """Timestamp tokens bound segments; words interpolate inside them."""
    ts = FakeTokenizer.SPECIALS["<|0.00|>"]
    # <|1.00|> = ts + 50 (0.02 s per step), tokens 5,6 inside [1.0, 2.0].
    scripted = [ts + 50, 5, 6, ts + 100]
    monkeypatch.setattr(
        tiny_model, "_greedy_segment_decode", lambda states, language: scripted
    )
    audio = (0.1 * np.random.default_rng(1).standard_normal(16000 * 3)).astype(np.float32)
    words = tiny_model.transcribe_words(audio, use_vad=False)
    assert [w.word for w in words] == ["w5", "w6"]
    assert words[0].start_seconds == pytest.approx(1.0)
    assert words[0].end_seconds == pytest.approx(1.5)
    assert words[1].end_seconds == pytest.approx(2.0)
