"""Encoder model + backend tests (tiny configs, masked batching exactness)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ser_tpu._internal.repr.encoder_backend import bucket_samples, plan_chunks
from ser_tpu._internal.repr.wav2vec2_backend import XlsrBackend, _encode_chunks
from ser_tpu._internal.repr.whisper_backend import WhisperEncoderBackend
from ser_tpu.models import whisper as whisper_model
from ser_tpu.models.wav2vec2 import Wav2Vec2Config


@pytest.fixture(scope="module")
def xlsr_tiny():
    return XlsrBackend(
        model_id="test/tiny",
        cache_root="/nonexistent",
        dtype="float32",
        init="random",
        config=Wav2Vec2Config.tiny(),
    )


def test_chunk_planning():
    assert plan_chunks(16000) == [(0, 16000)]
    assert plan_chunks(480000) == [(0, 480000)]
    assert plan_chunks(480001) == [(0, 480000), (480000, 1)]
    assert bucket_samples(15999) == 16000
    assert bucket_samples(16001) == 32000
    assert bucket_samples(10**9) == 480000


def test_xlsr_encode_timestamps_cover_clip(xlsr_tiny):
    audio = np.random.default_rng(0).standard_normal(32000).astype(np.float32)
    encoded = xlsr_tiny.encode_sequence(audio, 16000)
    assert encoded.backend_id == "jax_xlsr"
    assert encoded.embeddings.shape[1] == 64
    assert encoded.frame_start_seconds[0] == 0.0
    assert encoded.frame_end_seconds[-1] == pytest.approx(2.0)
    assert np.all(np.isfinite(encoded.embeddings))


def test_xlsr_masked_batching_is_bucket_invariant(xlsr_tiny):
    """Same audio padded into different buckets yields identical valid frames."""
    audio = np.random.default_rng(1).standard_normal(24000).astype(np.float32)
    length = audio.size
    short = np.zeros((1, 32000), np.float32)
    short[0, :length] = audio
    long = np.zeros((1, 64000), np.float32)
    long[0, :length] = audio
    e_short = np.asarray(
        _encode_chunks(xlsr_tiny._model, xlsr_tiny._params, jnp.asarray(short), jnp.asarray([length]))
    )
    e_long = np.asarray(
        _encode_chunks(xlsr_tiny._model, xlsr_tiny._params, jnp.asarray(long), jnp.asarray([length]))
    )
    n = xlsr_tiny._frames_for_length(length)
    np.testing.assert_allclose(e_short[0, :n], e_long[0, :n], atol=1e-4)


def test_xlsr_missing_weights_raise_typed_error():
    from ser_tpu._internal.runtime.errors import RuntimeDependencyError

    with pytest.raises(RuntimeDependencyError, match="SER_ALLOW_RANDOM_INIT"):
        XlsrBackend(
            model_id="org/never-downloaded",
            cache_root="/nonexistent",
            init="pretrained",
        )


def test_whisper_log_mel_shape_and_normalization():
    wave = jnp.zeros((1, whisper_model.CHUNK_SAMPLES), dtype=jnp.float32)
    mel = whisper_model.log_mel_spectrogram(wave, 80)
    assert mel.shape == (1, whisper_model.CHUNK_FRAMES, 80)
    # Silence normalizes to a constant within Whisper's (x+4)/4 range.
    assert float(jnp.max(mel)) <= 3.0


@pytest.fixture(scope="module")
def whisper_tiny():
    return WhisperEncoderBackend(
        model_id="test/whisper-tiny",
        cache_root="/nonexistent",
        dtype="float32",
        init="random",
        config=whisper_model.WhisperConfig.tiny(),
    )


def test_whisper_encoder_backend_frames(whisper_tiny):
    audio = np.random.default_rng(2).standard_normal(16000 * 3).astype(np.float32)
    encoded = whisper_tiny.encode_sequence(audio, 16000)
    assert encoded.backend_id == "jax_whisper_encoder"
    assert encoded.embeddings.shape[1] == 64
    # 3 s of a 30 s window with 1500 states → ~150 valid frames at 20 ms.
    assert encoded.embeddings.shape[0] == 150
    assert encoded.frame_end_seconds[-1] == pytest.approx(3.0)


def test_whisper_decoder_greedy_shapes():
    config = whisper_model.WhisperConfig.tiny()
    import jax

    decoder = whisper_model.WhisperDecoder(config)
    tokens = jnp.zeros((1, 8), dtype=jnp.int32)
    states = jnp.zeros((1, 16, config.d_model), dtype=jnp.float32)
    params = decoder.init(jax.random.PRNGKey(0), tokens, states)["params"]
    logits = decoder.apply({"params": params}, tokens, states)
    assert logits.shape == (1, 8, config.vocab_size)


def test_emotion2vec_backend_identity():
    from ser_tpu._internal.repr.emotion2vec_backend import Emotion2VecBackend

    backend = Emotion2VecBackend(
        model_id="test/e2v",
        cache_root="/nonexistent",
        init="random",
        config=Wav2Vec2Config.tiny(),
    )
    assert backend.backend_id == "emotion2vec"
    audio = np.random.default_rng(3).standard_normal(16000).astype(np.float32)
    encoded = backend.encode_sequence(audio, 16000)
    assert encoded.backend_id == "emotion2vec"


def test_matmul_frontend_matches_conv_frontend():
    """frontend_impl="matmul" (patch-gather + one MXU matmul) is numerically
    interchangeable with the nn.Conv lowering on the SAME param tree —
    checkpoints swap between the two without conversion."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from ser_tpu.models import wav2vec2

    cfg = wav2vec2.Wav2Vec2Config.tiny()
    cfg_mm = dataclasses.replace(cfg, frontend_impl="matmul")
    wave = jax.random.normal(jax.random.PRNGKey(1), (2, 12000), dtype=jnp.float32) * 0.1
    enc = wav2vec2.Wav2Vec2Encoder(cfg, compute_dtype=jnp.float32)
    enc_mm = wav2vec2.Wav2Vec2Encoder(cfg_mm, compute_dtype=jnp.float32)
    params = enc.init(jax.random.PRNGKey(0), wave)
    out = np.asarray(enc.apply(params, wave))
    out_mm = np.asarray(enc_mm.apply(params, wave))
    assert out.shape == out_mm.shape
    np.testing.assert_allclose(out, out_mm, atol=2e-5, rtol=1e-5)
    # Init paths are identical too (same names, shapes, initializer fns).
    params_mm = enc_mm.init(jax.random.PRNGKey(0), wave)
    flat = jax.tree_util.tree_leaves(params)
    flat_mm = jax.tree_util.tree_leaves(params_mm)
    assert all(np.allclose(a, b) for a, b in zip(flat, flat_mm))
