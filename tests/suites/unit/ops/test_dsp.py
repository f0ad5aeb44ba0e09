"""Numerical tests for the batched DSP primitives (librosa-convention checks)."""

import numpy as np
import jax.numpy as jnp
import pytest

from ser_tpu.ops import dsp, filters

SR = 22050


def _tone(freq: float, seconds: float, sr: int = SR) -> np.ndarray:
    t = np.arange(int(seconds * sr)) / sr
    return (0.4 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_stft_magnitude_matches_direct_numpy():
    rng = np.random.default_rng(1)
    signal = rng.standard_normal(4096).astype(np.float32)
    n_fft, hop = 1024, 256
    mag = np.asarray(dsp.stft_magnitude(jnp.asarray(signal[None, :]), n_fft, hop))[0]
    # Direct: center-pad with zeros, periodic hann, rFFT per column.
    padded = np.pad(signal, (n_fft // 2, n_fft // 2))
    window = filters.hann_window(n_fft)
    n_cols = 1 + len(signal) // hop
    expected = np.stack(
        [
            np.abs(np.fft.rfft(padded[c * hop : c * hop + n_fft] * window))
            for c in range(n_cols)
        ],
        axis=1,
    )
    assert mag.shape == expected.shape == (n_fft // 2 + 1, n_cols)
    np.testing.assert_allclose(mag, expected, rtol=1e-4, atol=1e-4)


def test_stft_peak_bin_tracks_tone_frequency():
    freq = 440.0
    mag = np.asarray(dsp.stft_magnitude(jnp.asarray(_tone(freq, 1.0)[None, :]), 2048, 512))[0]
    peak_bin = int(np.argmax(mag[:, mag.shape[1] // 2]))
    assert abs(peak_bin * SR / 2048 - freq) < SR / 2048


def test_mel_filterbank_shape_and_coverage():
    fb = filters.mel_filterbank(SR, 2048, 128)
    assert fb.shape == (128, 1025)
    # Every filter has support; rows are area-normalized (sum ~ 2/bandwidth).
    assert np.all(fb.sum(axis=1) > 0)
    # Mid-frequency bins are covered by at least one filter.
    assert np.all(fb[:, 30:700].sum(axis=0) > 0)


def test_dct_matrix_is_orthonormal():
    dct = filters.dct_ii_ortho(128, 128).astype(np.float64)
    np.testing.assert_allclose(dct @ dct.T, np.eye(128), atol=1e-5)  # float32 storage


def test_power_to_db_top_db_clamp_and_ref():
    power = jnp.asarray(np.array([[[1.0, 1e-12, 1e-3]]], dtype=np.float32))
    mask = jnp.asarray([[True, True, True]])
    db = np.asarray(dsp.power_to_db(power, mask, ref=1.0))[0, 0]
    assert db[0] == pytest.approx(0.0)
    assert db[1] == pytest.approx(-80.0)  # clamped at max - 80
    assert db[2] == pytest.approx(-30.0)


def test_chroma_identifies_pitch_class():
    # A440 should dominate chroma class A (index 9 with base C).
    signal = _tone(440.0, 1.0)
    mag = dsp.stft_magnitude(jnp.asarray(signal[None, :]), 2048, 512)
    mask = jnp.ones((1, mag.shape[-1]), dtype=bool)
    chroma = np.asarray(dsp.chroma_per_column(mag, mask, SR, 2048))[0]
    dominant = np.argmax(chroma.mean(axis=1))
    assert dominant == 9


def test_estimate_tuning_zero_for_concert_pitch_and_shifted_for_detuned():
    tuning_a440 = float(
        np.asarray(
            dsp.estimate_tuning(
                dsp.stft_magnitude(jnp.asarray(_tone(440.0, 1.0)[None, :]), 2048, 512),
                jnp.ones((1, 44), dtype=bool),
                SR,
                2048,
            )
        )[0]
    )
    assert abs(tuning_a440) <= 0.05
    # Quarter-semitone-sharp tone: 440 * 2**(0.25/12)
    detuned = _tone(440.0 * 2 ** (0.25 / 12), 1.0)
    tuning_det = float(
        np.asarray(
            dsp.estimate_tuning(
                dsp.stft_magnitude(jnp.asarray(detuned[None, :]), 2048, 512),
                jnp.ones((1, 44), dtype=bool),
                SR,
                2048,
            )
        )[0]
    )
    assert 0.15 <= tuning_det <= 0.35


def test_median_filter_axis_matches_scipy():
    from scipy.ndimage import median_filter

    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 40, 50)).astype(np.float32)
    ours = np.asarray(dsp._median_filter_axis(jnp.asarray(x), 31, axis=-1))
    theirs = median_filter(x, size=(1, 1, 31), mode="reflect")
    np.testing.assert_allclose(ours, theirs, atol=1e-6)
    ours_f = np.asarray(dsp._median_filter_axis(jnp.asarray(x), 31, axis=-2))
    theirs_f = median_filter(x, size=(1, 31, 1), mode="reflect")
    np.testing.assert_allclose(ours_f, theirs_f, atol=1e-6)


def test_harmonic_mask_prefers_steady_tone_over_click():
    # A steady tone is harmonic (mask→1); a single-column click is percussive.
    sr = SR
    signal = _tone(440.0, 1.0)
    signal[sr // 2 : sr // 2 + 64] += 2.0  # click
    mag = dsp.stft_magnitude(jnp.asarray(signal[None, :]), 2048, 512)
    mask = np.asarray(dsp.harmonic_mask(mag))[0]
    tone_bin = int(round(440 * 2048 / sr))
    click_col = int(round((sr // 2) / 512))
    assert mask[tone_bin, 10] > 0.9
    assert mask[600, click_col] < 0.3  # high-freq click bin is percussive


def test_masked_mean_ignores_padding_columns():
    values = jnp.asarray(np.arange(12, dtype=np.float32).reshape(1, 2, 6))
    mask = jnp.asarray([[True, True, True, False, False, False]])
    out = np.asarray(dsp._masked_mean_cols(values, mask))
    np.testing.assert_allclose(out, [[1.0, 7.0]])
