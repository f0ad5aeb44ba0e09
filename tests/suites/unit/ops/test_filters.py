"""Per-owner tests for ``ser_tpu/ops/filters.py``.

The filterbank constructors are the static constants behind the fast-profile
DSP programs (reference semantics: ``ser/_internal/utils/dsp.py:96-151``,
librosa 0.11 conventions). The golden-fixture suite pins the end-to-end
features; these tests pin the mathematical invariants of each constructor so
a regression is attributed to the right owner.
"""

from __future__ import annotations

import numpy as np
import pytest

from ser_tpu.ops import filters


def test_fft_frequencies_endpoints_and_spacing():
    freqs = filters.fft_frequencies(sr=16000, n_fft=512)
    assert freqs.shape == (257,)
    assert freqs[0] == 0.0
    assert freqs[-1] == pytest.approx(8000.0)
    np.testing.assert_allclose(np.diff(freqs), 16000 / 512, rtol=1e-12)


def test_slaney_mel_roundtrip_and_breakpoint():
    hz = np.array([0.0, 250.0, 999.0, 1000.0, 4000.0, 7999.0])
    mel = filters.hz_to_mel_slaney(hz)
    np.testing.assert_allclose(filters.mel_to_hz_slaney(mel), hz, rtol=1e-10, atol=1e-8)
    # Linear region: 200/3 Hz per mel below 1 kHz.
    assert mel[1] == pytest.approx(250.0 / (200.0 / 3.0))
    # The scale is continuous and strictly increasing across the 1 kHz knee.
    assert np.all(np.diff(mel) > 0)
    knee = filters.hz_to_mel_slaney(np.array([1000.0 - 1e-9, 1000.0 + 1e-9]))
    assert knee[1] - knee[0] < 1e-6


def test_mel_filterbank_shape_support_and_area_norm():
    fb = filters.mel_filterbank(sr=16000, n_fft=512, n_mels=40)
    assert fb.shape == (40, 257)
    assert fb.dtype == np.float32
    assert np.all(fb >= 0.0)
    # Triangles are compactly supported and every filter has mass.
    assert np.all(fb.sum(axis=1) > 0.0)
    # Slaney area normalization: height 2/bandwidth x triangle base/2 makes
    # every filter integrate (over Hz) to ~1.
    bin_hz = 16000 / 512
    areas = fb.sum(axis=1) * bin_hz
    np.testing.assert_allclose(areas, 1.0, rtol=0.05)
    # lru_cache returns the identical array object for an identical call
    # shape (keyword and positional calls key separately in functools).
    assert filters.mel_filterbank(sr=16000, n_fft=512, n_mels=40) is fb


def test_dct_ii_ortho_rows_are_orthonormal():
    d = filters.dct_ii_ortho(20, 64).astype(np.float64)
    gram = d @ d.T
    np.testing.assert_allclose(gram, np.eye(20), atol=1e-6)
    # DC row of an orthonormal DCT-II is the constant 1/sqrt(n_in).
    np.testing.assert_allclose(d[0], 1.0 / np.sqrt(64), atol=1e-7)


def test_chroma_base_bins_shift_invariance_contract():
    frqbins, widths = filters.chroma_base_bins(sr=16000, n_fft=512, n_chroma=12)
    assert frqbins.shape == widths.shape == (512 - 1 + 1,)
    # Octave doubling advances exactly n_chroma log-frequency bins.
    freqs = np.linspace(0, 16000, 512, endpoint=False)[1:]
    k = 100
    idx2 = np.argmin(np.abs(freqs - 2 * freqs[k]))
    assert frqbins[1 + idx2] - frqbins[1 + k] == pytest.approx(12.0, abs=1e-6)
    # Widths are floored at one bin (librosa convention).
    assert np.all(widths >= 1.0)


def test_contrast_band_slices_cover_spectrum_in_order():
    slices = filters.contrast_band_slices(sr=16000, n_fft=512)
    assert len(slices) == 7  # n_bands + 1
    starts = [s for s, _, _ in slices]
    stops = [e for _, e, _ in slices]
    assert starts == sorted(starts)
    assert all(stop > start for start, stop, _ in slices)
    # Final band runs to the end of the rFFT grid.
    assert stops[-1] == 257
    # Quantile counts are positive and bounded by the band size.
    for start, stop, n_quant in slices:
        assert 1 <= n_quant <= stop - start


def test_contrast_band_empty_raises():
    with pytest.raises(ValueError, match="empty"):
        # fmin far above Nyquist leaves the upper octave bands without bins.
        filters.contrast_band_slices(sr=16000, n_fft=512, fmin=9000.0)


def test_log_frequency_filterbank_rows_normalized_and_nyquist_zeroed():
    fb = filters.log_frequency_filterbank(sr=16000, n_fft=512)
    assert fb.shape == (36 * 7, 257)
    center = 32.70319566257483 * 2.0 ** (np.arange(36 * 7) / 36)
    sums = fb.sum(axis=1)
    # Bands above Nyquist are hard-zeroed.
    assert np.all(fb[center >= 8000.0] == 0.0)
    # Under-resolved rows (constant-Q sigma below the grid spacing, lowest
    # octaves) hit the 1e-12 norm floor and come out attenuated rather than
    # amplified: sums never exceed 1.
    live = center < 8000.0
    assert np.all(sums[live] <= 1.0 + 1e-5)
    assert np.all(sums >= 0.0)
    # Constant-Q sigma (= center/q/2) exceeds the 31.25 Hz bin spacing from
    # ~1.6 kHz up, so every band there (below Nyquist) is unit-normalized.
    broad = (center > 1600.0) & live
    assert broad.sum() >= 40
    assert np.all(np.abs(sums[broad] - 1.0) < 1e-5)


def test_cq_to_chroma_fold_partitions_bins():
    fold = filters.cq_to_chroma_fold()
    assert fold.shape == (12, 36 * 7)
    # Every CQT bin maps to exactly one chroma class.
    np.testing.assert_array_equal(fold.sum(axis=0), np.ones(36 * 7, dtype=np.float32))
    # Round-robin in groups of bins_per_octave // n_chroma = 3.
    assert fold[0, 0] == fold[0, 1] == fold[0, 2] == 1.0
    assert fold[1, 3] == 1.0 and fold[0, 3] == 0.0


def test_tonnetz_transform_shape_and_fifths_geometry():
    phi = filters.tonnetz_transform()
    assert phi.shape == (6, 12)
    # Rows come in (sin, cos) pairs per interval circle: the -0.5 shift on
    # even rows turns cos into sin, so each pair traces a circle of radius r
    # (1, 1, 0.5 for fifths / minor thirds / major thirds).
    for pair, radius in ((0, 1.0), (2, 1.0), (4, 0.5)):
        np.testing.assert_allclose(
            phi[pair] ** 2 + phi[pair + 1] ** 2, radius**2, atol=1e-6
        )
    # Column 0 (pitch class C): the unshifted rows sit at angle 0 -> cos = r.
    assert phi[1, 0] == pytest.approx(1.0, abs=1e-6)
    assert phi[5, 0] == pytest.approx(0.5, abs=1e-6)
    assert phi[0, 0] == pytest.approx(0.0, abs=1e-6)


def test_hann_window_periodic_convention():
    w = filters.hann_window(400)
    assert w.shape == (400,)
    assert w[0] == pytest.approx(0.0, abs=1e-7)
    # Periodic (fftbins=True): w[n] = 0.5 - 0.5 cos(2 pi n / N), so the
    # midpoint hits exactly 1 and w[N-1] != 0 (unlike the symmetric window).
    assert w[200] == pytest.approx(1.0, abs=1e-7)
    assert w[-1] > 0.0
    assert filters.hann_window(1).tolist() == [1.0]
