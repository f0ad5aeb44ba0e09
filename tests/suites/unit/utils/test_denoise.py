"""Spectral-gate denoise: SNR improvement and structural safety."""

import numpy as np

from ser_tpu._internal.utils.denoise import spectral_gate_denoise


def _snr_db(clean: np.ndarray, noisy: np.ndarray) -> float:
    noise = noisy - clean
    return 10.0 * np.log10(
        (np.sum(clean**2) + 1e-12) / (np.sum(noise**2) + 1e-12)
    )


def test_denoise_improves_snr_on_stationary_noise():
    sr = 16000
    t = np.arange(sr * 3) / sr
    rng = np.random.default_rng(0)
    clean = np.zeros_like(t, dtype=np.float32)
    # Speech-like bursts: tone complexes in the middle two seconds.
    active = (t > 0.75) & (t < 2.25)
    clean[active] = (
        0.5 * np.sin(2 * np.pi * 220 * t[active])
        + 0.3 * np.sin(2 * np.pi * 660 * t[active])
    ).astype(np.float32)
    noise = (0.05 * rng.standard_normal(t.size)).astype(np.float32)
    noisy = clean + noise

    denoised = spectral_gate_denoise(noisy)
    assert denoised.shape == noisy.shape
    assert denoised.dtype == np.float32
    assert _snr_db(clean, denoised) > _snr_db(clean, noisy) + 3.0


def test_denoise_preserves_dominant_tone_energy():
    """A tone burst surrounded by pauses (speech-shaped) survives the gate."""
    sr = 16000
    t = np.arange(int(sr * 1.5)) / sr
    tone = np.zeros_like(t, dtype=np.float32)
    active = (t > 0.4) & (t < 1.1)
    tone[active] = (0.8 * np.sin(2 * np.pi * 440 * t[active])).astype(np.float32)
    noisy = tone + (0.02 * np.random.default_rng(1).standard_normal(t.size)).astype(
        np.float32
    )
    out = spectral_gate_denoise(noisy)
    spectrum_in = np.abs(np.fft.rfft(tone))
    spectrum_out = np.abs(np.fft.rfft(out))
    peak = np.argmax(spectrum_in)
    assert spectrum_out[peak] > 0.8 * spectrum_in[peak]


def test_short_audio_passthrough():
    short = np.ones(256, dtype=np.float32)
    out = spectral_gate_denoise(short)
    assert np.array_equal(out, short)
