"""Closed-form analytic oracles for the hairiest DSP families.

The golden-fixture suite (``test_dsp_golden_fixtures.py``) compares against
generated fixtures — same-author artifacts, so a shared misreading of the
librosa semantics (reference ``ser/_internal/utils/dsp.py:96-151``) could
pass both sides. These tests break that coupling with constructions whose
expected values are DERIVED, not generated:

- pure tones at known detunings → tuning offset and chroma class are exact
  consequences of ``hz_to_octs`` arithmetic (A440/16 reference, 0.01-bin
  histogram) and the C-rolled chroma filterbank;
- synthetic harmonic+percussive line mixtures → the margin-1, power-2 HPSS
  soft mask has a closed form per region (h²/(h²+p²) with exact medians);
- two-level spectra → spectral contrast collapses to
  ``10·log10(peak) − 10·log10(valley)`` per band, exactly.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from ser_tpu.ops import dsp, filters

SR = 22050
N_FFT = 2048


def _tone_magnitude(freq_hz: float, seconds: float = 0.5) -> tuple[jnp.ndarray, jnp.ndarray]:
    t = np.arange(int(seconds * SR)) / SR
    tone = np.sin(2 * np.pi * freq_hz * t).astype(np.float32)
    mag = dsp.stft_magnitude(jnp.asarray(tone[None, :]), N_FFT, N_FFT // 4)
    col_mask = jnp.ones((1, mag.shape[-1]), dtype=bool)
    return mag, col_mask


@pytest.mark.parametrize("detune_bins", [-0.30, -0.12, 0.0, 0.18, 0.25])
def test_estimate_tuning_recovers_known_detuning(detune_bins):
    """A pure tone at 440·2^(δ/12) Hz has tuning residual exactly δ.

    Derivation: octs = log2(f / 27.5) = 4 + δ/12, so
    mod(12·octs, 1) = δ (for |δ| < 0.5 after the ≥0.5 wrap). The estimate is
    quantized to the 0.01-bin histogram and carries the parabolic
    interpolation's sub-bin bias on the Hann mainlobe (up to ~0.08 FFT bins
    ≈ 0.035 semitones at 440 Hz with this sr/n_fft — an estimator property,
    not an implementation error); 0.05 bins covers both with margin.
    """
    freq = 440.0 * 2.0 ** (detune_bins / 12.0)
    mag, col_mask = _tone_magnitude(freq)
    tuning = float(np.asarray(dsp.estimate_tuning(mag, col_mask, SR, N_FFT))[0])
    assert abs(tuning - detune_bins) < 0.05


def test_estimate_tuning_silence_is_zero():
    mag = jnp.zeros((1, 1 + N_FFT // 2, 8), dtype=jnp.float32)
    col_mask = jnp.ones((1, 8), dtype=bool)
    assert float(np.asarray(dsp.estimate_tuning(mag, col_mask, SR, N_FFT))[0]) == 0.0


@pytest.mark.parametrize(
    "freq_hz, pitch_class",
    [
        (440.0, 9),  # A4 — index 9 once the filterbank is rolled to C=0
        (261.6256, 0),  # C4
        (329.6276, 4),  # E4
    ],
)
def test_chroma_argmax_is_the_tone_pitch_class(freq_hz, pitch_class):
    mag, col_mask = _tone_magnitude(freq_hz)
    chroma = np.asarray(dsp.chroma_per_column(mag, col_mask, SR, N_FFT))
    # Column-wise argmax over interior columns (edges see window leakage).
    interior = chroma[0, :, 2:-2]
    assert (interior.argmax(axis=0) == pitch_class).all()
    # Inf-norm normalization puts the winning class at exactly 1.
    np.testing.assert_allclose(interior.max(axis=0), 1.0, atol=1e-6)


def test_harmonic_mask_closed_form_on_line_mixture():
    """Horizontal (harmonic) + vertical (percussive) lines → exact masks.

    With a stationary tone of amplitude a at bin i and a broadband impulse
    of amplitude b at column j (widths 1 « kernel 31):
      - on the tone off the impulse: time-median=a, freq-median=0 → mask 1;
      - on the impulse off the tone: time-median=0, freq-median=b → mask 0;
      - at the crossing: medians (a, b) → mask a²/(a²+b²);
      - in silence: both medians 0 → mask 0 (librosa's zero-division guard).
    """
    n_bins, n_cols = 64, 64
    a, b = 3.0, 1.5
    tone_bin, impulse_col = 30, 40
    mag = np.zeros((1, n_bins, n_cols), dtype=np.float32)
    mag[0, tone_bin, :] = a
    mag[0, :, impulse_col] = b
    mag[0, tone_bin, impulse_col] = a + b
    mask = np.asarray(dsp.harmonic_mask(jnp.asarray(mag), kernel_size=31))

    on_tone = mask[0, tone_bin, 10]
    on_impulse = mask[0, 10, impulse_col]
    crossing = mask[0, tone_bin, impulse_col]
    silence = mask[0, 10, 10]
    np.testing.assert_allclose(on_tone, 1.0, atol=1e-6)
    np.testing.assert_allclose(on_impulse, 0.0, atol=1e-6)
    np.testing.assert_allclose(crossing, a**2 / (a**2 + b**2), atol=1e-5)
    np.testing.assert_allclose(silence, 0.0, atol=1e-6)


def test_harmonic_mask_respects_column_mask_at_signal_end():
    """The clamped time-median must not read zero-padding past the signal."""
    n_bins, n_cols, valid = 32, 64, 40
    mag = np.zeros((1, n_bins, n_cols), dtype=np.float32)
    mag[0, 5, :valid] = 2.0  # tone that ends exactly at the valid boundary
    col_mask = jnp.asarray(np.arange(n_cols)[None, :] < valid)
    mask = np.asarray(
        dsp.harmonic_mask(jnp.asarray(mag), kernel_size=31, col_mask=col_mask)
    )
    # Without clamping, columns within 15 of the boundary would see zeros and
    # the mask would sag below 1; with edge replication it stays exactly 1.
    np.testing.assert_allclose(mask[0, 5, :valid], 1.0, atol=1e-6)


def test_spectral_contrast_two_level_bands_are_exact():
    """Alternating two-level dB spectra → contrast = 10·log10(hi/lo) everywhere.

    The reference's contrast pipeline order-statistics a dB spectrogram and
    re-compresses the band means (librosa ``linear=False`` over an S that is
    already dB — the pinned faithful quirk). With every band holding only the
    values {lo, hi} and quantile counts ≤ the per-band multiplicity, the
    valley mean is exactly lo and the peak mean exactly hi, so every band's
    contrast is 10·log10(hi) − 10·log10(lo) — here exactly 20.
    """
    n_bins = 1 + N_FFT // 2
    n_cols = 6
    lo, hi = 10.0, 1000.0
    s_db = np.empty((1, n_bins, n_cols), dtype=np.float32)
    s_db[0, 0::2, :] = lo
    s_db[0, 1::2, :] = hi
    col_mask = jnp.ones((1, n_cols), dtype=bool)
    for start, stop, n_quant in filters.contrast_band_slices(SR, N_FFT):
        band = s_db[0, start:stop, 0]
        assert (band == lo).sum() >= n_quant and (band == hi).sum() >= n_quant
    contrast = np.asarray(
        dsp.spectral_contrast_per_column(jnp.asarray(s_db), col_mask, SR, N_FFT)
    )
    assert contrast.shape[1] == 7
    np.testing.assert_allclose(contrast, 20.0, atol=1e-4)


def test_spectral_contrast_constant_spectrum_is_zero():
    n_bins = 1 + N_FFT // 2
    s_db = np.full((1, n_bins, 4), 55.5, dtype=np.float32)
    col_mask = jnp.ones((1, 4), dtype=bool)
    contrast = np.asarray(
        dsp.spectral_contrast_per_column(jnp.asarray(s_db), col_mask, SR, N_FFT)
    )
    np.testing.assert_allclose(contrast, 0.0, atol=1e-5)
