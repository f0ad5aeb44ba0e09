"""Pallas fused mel kernel (interpret mode) + native C++ decoder tests."""

import numpy as np
import jax.numpy as jnp
import pytest

from ser_tpu.ops.pallas_kernels import conv_stft, fused_log_mel, reference_log_mel


def _wave(seconds=1.5, seed=0, batch=2):
    rng = np.random.default_rng(seed)
    return jnp.asarray(
        0.3 * rng.standard_normal((batch, int(16000 * seconds))), dtype=jnp.float32
    )


def test_conv_stft_matches_rfft():
    wave = _wave(0.5)
    spec = np.asarray(conv_stft(wave, 400, 160))
    n_bins = 201
    mag_conv = np.sqrt(spec[..., :n_bins] ** 2 + spec[..., n_bins:] ** 2)
    # Direct rfft with the same reflect padding.
    from ser_tpu.ops import filters

    padded = np.pad(np.asarray(wave), ((0, 0), (200, 200)), mode="reflect")
    window = filters.hann_window(400)
    n_frames = 1 + wave.shape[1] // 160
    direct = np.stack(
        [
            np.abs(np.fft.rfft(padded[:, t * 160 : t * 160 + 400] * window, axis=-1))
            for t in range(n_frames)
        ],
        axis=1,
    )
    assert mag_conv.shape == direct.shape
    np.testing.assert_allclose(mag_conv, direct, atol=2e-3)


def test_fused_log_mel_matches_reference_interpret():
    wave = _wave(2.0)
    ref = np.asarray(reference_log_mel(wave, n_mels=80))
    fused = np.asarray(fused_log_mel(wave, n_mels=80, interpret=True))
    np.testing.assert_allclose(fused, ref, atol=5e-5)


def test_fused_log_mel_128_mels():
    wave = _wave(1.0, seed=3, batch=1)
    ref = np.asarray(reference_log_mel(wave, n_mels=128))
    fused = np.asarray(fused_log_mel(wave, n_mels=128, interpret=True))
    np.testing.assert_allclose(fused, ref, atol=5e-5)


def test_native_decoder_parity(tmp_path):
    from ser_tpu._internal.utils import native_audio
    from ser_tpu._internal.utils.audio_io import (
        _decode_wav_bytes,
        _prepare_audio_buffer,
        write_wav,
    )

    if not native_audio.native_decoder_available():
        pytest.skip("native toolchain unavailable")
    sr = 22050
    audio = (0.7 * np.sin(2 * np.pi * 330 * np.arange(sr) / sr)).astype(np.float32)
    path = tmp_path / "clip.wav"
    write_wav(path, audio, sr)
    data = path.read_bytes()
    native, rate_native = native_audio.decode_wav_mono_native(data)
    python, rate_python = (
        _prepare_audio_buffer(_decode_wav_bytes(data)[0]),
        _decode_wav_bytes(data)[1],
    )
    assert rate_native == rate_python == sr
    np.testing.assert_allclose(native, python, atol=1e-6)


def test_native_decoder_rejects_garbage():
    from ser_tpu._internal.utils import native_audio

    if not native_audio.native_decoder_available():
        pytest.skip("native toolchain unavailable")
    with pytest.raises(native_audio.NativeDecodeError):
        native_audio.decode_wav_mono_native(b"definitely not a wav file")
