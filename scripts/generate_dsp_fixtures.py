#!/usr/bin/env python
"""Generates golden mel/MFCC fixtures for the fast-profile DSP parity tests.

Writes ``tests/fixtures/dsp/golden_mel_mfcc_v1.npz``: per-signal mean mel
power (128,) and mean MFCC (40,) vectors for deterministic 3-second signals,
computed by an implementation INDEPENDENT of ``ser_tpu/ops`` (plain numpy +
scipy.fft.dct written from librosa's documented conventions: periodic Hann,
center zero-pad, Slaney mel scale with Slaney area normalization,
``power_to_db`` ref=1/top_db=80, orthonormal DCT-II).

Run with ``--use-librosa`` on a machine where librosa is installed to upgrade
the fixtures to true librosa goldens (same keys, same tolerance contract);
the zero-egress build environment lacks librosa, so the independent
implementation is the default source (documented in the fixture's meta).
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np
from scipy.fft import dct

N_FFT = 2048
HOP = 512
N_MELS = 128
N_MFCC = 40
SAMPLE_RATES = (16000, 22050)
SECONDS = 3.0


def signals(sr: int) -> dict[str, np.ndarray]:
    t = np.arange(int(SECONDS * sr)) / sr
    rng = np.random.default_rng(0)
    return {
        "sine440": (0.6 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32),
        "chirp": (
            0.5 * np.sin(2 * np.pi * (100.0 * t + (4000.0 - 100.0) / (2 * SECONDS) * t * t))
        ).astype(np.float32),
        "noise": (0.3 * rng.standard_normal(t.size)).astype(np.float32),
        "am_tone": (
            0.4 * np.sin(2 * np.pi * 220.0 * t) * (1.0 + 0.5 * np.sin(2 * np.pi * 3.0 * t))
        ).astype(np.float32),
    }


# ----------------------- independent implementation ----------------------- #


def _hann_periodic(n: int) -> np.ndarray:
    return 0.5 * (1.0 - np.cos(2.0 * np.pi * np.arange(n) / n))


def _stft_power(y: np.ndarray) -> np.ndarray:
    pad = N_FFT // 2
    padded = np.concatenate([np.zeros(pad), y.astype(np.float64), np.zeros(pad)])
    n_cols = 1 + y.size // HOP
    window = _hann_periodic(N_FFT)
    cols = np.stack(
        [padded[i * HOP : i * HOP + N_FFT] * window for i in range(n_cols)], axis=1
    )
    return np.abs(np.fft.rfft(cols, n=N_FFT, axis=0)) ** 2  # (F, T)


def _hz_to_mel(f):
    f = np.asarray(f, dtype=np.float64)
    mel = f / (200.0 / 3.0)
    log_region = f >= 1000.0
    log_step = np.log(6.4) / 27.0
    mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-12) / 1000.0) / log_step, mel)
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f = m * (200.0 / 3.0)
    log_region = m >= 15.0
    log_step = np.log(6.4) / 27.0
    return np.where(log_region, 1000.0 * np.exp(log_step * (m - 15.0)), f)


def _mel_filterbank(sr: int) -> np.ndarray:
    fmax = sr / 2.0
    mel_pts = _mel_to_hz(np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), N_MELS + 2))
    fft_freqs = np.fft.rfftfreq(N_FFT, d=1.0 / sr)
    weights = np.zeros((N_MELS, fft_freqs.size))
    for m in range(N_MELS):
        lower, center, upper = mel_pts[m], mel_pts[m + 1], mel_pts[m + 2]
        up = (fft_freqs - lower) / max(center - lower, 1e-12)
        down = (upper - fft_freqs) / max(upper - center, 1e-12)
        weights[m] = np.maximum(0.0, np.minimum(up, down))
        weights[m] *= 2.0 / (upper - lower)  # Slaney area normalization
    return weights


def _power_to_db(power: np.ndarray, ref: float = 1.0) -> np.ndarray:
    amin = 1e-10
    log_spec = 10.0 * np.log10(np.maximum(amin, power))
    log_spec -= 10.0 * np.log10(np.maximum(amin, ref))
    return np.maximum(log_spec, log_spec.max() - 80.0)


def independent_mel_mfcc(y: np.ndarray, sr: int) -> tuple[np.ndarray, np.ndarray]:
    power = _stft_power(y)
    mel = _mel_filterbank(sr) @ power  # (M, T)
    log_mel = _power_to_db(mel, ref=1.0)
    mfcc = dct(log_mel, type=2, axis=0, norm="ortho")[:N_MFCC]
    return mel.mean(axis=1), mfcc.mean(axis=1)


# ------------- chroma: librosa chroma_stft with tuning estimation ----------- #
# Rederived from librosa 0.11's documented algorithms (pitch.piptrack,
# pitch.pitch_tuning, filters.chroma) — fully independent of ser_tpu/ops.

_A440_OCT_REF = 27.5  # A440 / 16


def _localmax(x: np.ndarray) -> np.ndarray:
    """librosa util.localmax along axis 0 with edge padding."""
    padded = np.pad(x, ((1, 1), (0, 0)), mode="edge")
    return (x > padded[:-2]) & (x >= padded[2:])


def _piptrack(mag: np.ndarray, sr: int, fmin=150.0, fmax=4000.0, threshold=0.1):
    """Parabolic-interpolation pitch tracking (librosa piptrack defaults)."""
    n_fft = 2 * (mag.shape[0] - 1)
    fft_freqs = np.linspace(0.0, sr / 2.0, mag.shape[0])
    fmax = min(fmax, sr / 2.0)

    avg = 0.5 * (mag[2:] - mag[:-2])
    denom = 2.0 * mag[1:-1] - mag[2:] - mag[:-2]
    tiny = np.finfo(mag.dtype).tiny
    shift = avg / (denom + np.where(np.abs(denom) < tiny, 1.0, 0.0))
    avg = np.pad(avg, ((1, 1), (0, 0)))
    shift = np.pad(shift, ((1, 1), (0, 0)))
    dskew = 0.5 * avg * shift

    freq_mask = ((fft_freqs >= fmin) & (fft_freqs < fmax))[:, None]
    ref_value = threshold * mag.max(axis=0, keepdims=True)
    candidates = freq_mask & _localmax(mag * (mag > ref_value))

    pitches = np.zeros_like(mag)
    mags = np.zeros_like(mag)
    bin_idx = np.arange(mag.shape[0], dtype=np.float64)[:, None]
    pitches[candidates] = ((bin_idx + shift) * sr / n_fft)[candidates]
    mags[candidates] = (mag + dskew)[candidates]
    return pitches, mags


def _pitch_tuning(frequencies: np.ndarray, resolution=0.01, bins_per_octave=12) -> float:
    frequencies = frequencies[frequencies > 0]
    if frequencies.size == 0:
        return 0.0
    octs = np.log2(frequencies / _A440_OCT_REF)
    residual = np.mod(bins_per_octave * octs, 1.0)
    residual[residual >= 0.5] -= 1.0
    bins = np.linspace(-0.5, 0.5, int(np.ceil(1.0 / resolution)) + 1)
    counts, edges = np.histogram(residual, bins)
    return float(edges[np.argmax(counts)])


def _estimate_tuning(mag: np.ndarray, sr: int, bins_per_octave=12) -> float:
    pitches, mags = _piptrack(mag, sr)
    pitch_mask = pitches > 0
    threshold = np.median(mags[pitch_mask]) if pitch_mask.any() else 0.0
    return _pitch_tuning(
        pitches[(mags >= threshold) & pitch_mask], bins_per_octave=bins_per_octave
    )


def _chroma_filterbank(
    sr: int, n_fft: int, tuning: float, n_chroma=12, ctroct=5.0, octwidth=2.0
) -> np.ndarray:
    """librosa filters.chroma: Gaussian log-frequency profiles, base C roll."""
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    frqbins = n_chroma * np.log2(frequencies / _A440_OCT_REF) - tuning
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidth = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))
    d = frqbins[None, :] - np.arange(n_chroma, dtype=np.float64)[:, None]
    half = np.round(n_chroma / 2.0)
    d = np.remainder(d + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2.0 * d / binwidth[None, :]) ** 2)
    norms = np.sqrt(np.sum(wts * wts, axis=0, keepdims=True))
    wts = wts / np.where(norms < np.finfo(np.float64).tiny, 1.0, norms)
    wts *= np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2))[None, :]
    wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return wts[:, : 1 + n_fft // 2]


def independent_chroma(y: np.ndarray, sr: int) -> np.ndarray:
    """chroma_stft(S=|STFT|, tuning=None): estimate tuning → project → inf-norm."""
    mag = np.sqrt(_stft_power(y))
    tuning = _estimate_tuning(mag, sr)
    fb = _chroma_filterbank(sr, N_FFT, tuning)
    raw = fb @ mag
    denom = np.max(np.abs(raw), axis=0, keepdims=True)
    chroma = raw / np.where(denom < np.finfo(np.float64).tiny, 1.0, denom)
    return chroma.mean(axis=1)


# ------------- spectral contrast: librosa quantile band statistics ---------- #


def independent_contrast(y: np.ndarray, sr: int, fmin=200.0, n_bands=6, quantile=0.02):
    """spectral_contrast(S=power_to_db(mag^2, ref=max)) — the reference's call."""
    power = _stft_power(y)
    s_db = _power_to_db(power, ref=power.max())
    freq = np.linspace(0.0, sr / 2.0, s_db.shape[0])
    octa = np.zeros(n_bands + 2)
    octa[1:] = fmin * (2.0 ** np.arange(0, n_bands + 1))
    valley = np.zeros((n_bands + 1, s_db.shape[1]))
    peak = np.zeros_like(valley)
    for k in range(n_bands + 1):
        f_low, f_high = octa[k], octa[k + 1]
        current_band = (freq >= f_low) & (freq <= f_high)
        idx = np.flatnonzero(current_band)
        if k > 0:
            current_band[idx[0] - 1] = True
        if k == n_bands:
            current_band[idx[-1] + 1 :] = True
        sub_band = s_db[current_band]
        if k < n_bands:
            sub_band = sub_band[:-1]
        n_quant = int(max(np.rint(quantile * np.sum(current_band)), 1))
        sorted_band = np.sort(sub_band, axis=0)
        valley[k] = sorted_band[:n_quant].mean(axis=0)
        peak[k] = sorted_band[-n_quant:].mean(axis=0)
    return (_power_to_db(peak) - _power_to_db(valley)).mean(axis=1)


# ------------- tonnetz: repo-documented pseudo-CQT pipeline ----------------- #
# The production tonnetz deviates from librosa BY DESIGN (HPSS mask on the
# existing STFT low band + pseudo-CQT matmul instead of istft + recursive CQT;
# see ser_tpu/ops/dsp.py tonnetz_per_column). This golden is an independent
# numpy rederivation of that documented algorithm — it pins the implementation
# against regressions; the deviation itself is the recorded design decision.


def _median_filter_freq(x: np.ndarray, width: int) -> np.ndarray:
    """Running median along axis 0, symmetric (reflect-including-edge) pad."""
    half = width // 2
    padded = np.pad(x, ((half, half), (0, 0)), mode="symmetric")
    stacked = np.stack([padded[k : k + x.shape[0]] for k in range(width)], axis=0)
    return np.sort(stacked, axis=0)[half]


def _median_filter_time_clamped(x: np.ndarray, width: int) -> np.ndarray:
    """Running median along axis 1 with window indices clamped to the edges."""
    half = width // 2
    n_cols = x.shape[1]
    idx = np.clip(np.arange(n_cols)[:, None] + np.arange(-half, half + 1)[None, :], 0, n_cols - 1)
    gathered = x[:, idx]  # (F, T, W)
    return np.sort(gathered, axis=2)[:, :, half]


def independent_tonnetz(y: np.ndarray, sr: int, lowband_hz=5500.0) -> np.ndarray:
    mag = np.sqrt(_stft_power(y))
    tiny = float(np.finfo(np.float32).tiny)

    n_keep = min(mag.shape[0], int(lowband_hz / (sr / N_FFT)) + 16)
    low = mag[:n_keep]
    harm = _median_filter_time_clamped(low, 31)
    perc = _median_filter_freq(low, 31)
    z = np.maximum(harm, perc)
    bad = z < tiny
    z = np.where(bad, 1.0, z)
    mask = np.where(bad, 0.0, (harm / z) ** 2 / ((harm / z) ** 2 + (perc / z) ** 2 + tiny))
    harmonic = low * mask

    # Pseudo-CQT Gaussian filterbank (36 bins/octave, 7 octaves from C1).
    bins_per_octave, n_octaves, fmin_c1 = 36, 7, 32.70319566257483
    n_cq = bins_per_octave * n_octaves
    fftfreqs = np.linspace(0.0, sr / 2.0, 1 + N_FFT // 2)
    center = fmin_c1 * 2.0 ** (np.arange(n_cq) / bins_per_octave)
    q = 1.0 / (2.0 ** (1.0 / bins_per_octave) - 1.0)
    sigma = center / q / 2.0
    cq_fb = np.exp(-0.5 * ((fftfreqs[None, :] - center[:, None]) / sigma[:, None]) ** 2)
    cq_fb /= np.maximum(cq_fb.sum(axis=1, keepdims=True), 1e-12)
    cq_fb[center >= sr / 2.0] = 0.0
    cq_fb = cq_fb[:, :n_keep]

    merge = bins_per_octave // 12
    fold = np.zeros((12, n_cq))
    fold[(np.arange(n_cq) // merge) % 12, np.arange(n_cq)] = 1.0

    chroma = fold @ (cq_fb @ harmonic)
    denom = np.sum(np.abs(chroma), axis=0, keepdims=True)
    chroma = chroma / np.where(denom < tiny, 1.0, denom)

    dim_map = np.linspace(0, 12, num=12, endpoint=False)
    scale = np.asarray([7.0 / 6, 7.0 / 6, 3.0 / 2, 3.0 / 2, 2.0 / 3, 2.0 / 3])
    v = np.multiply.outer(scale, dim_map)
    v[::2] -= 0.5
    r = np.array([1.0, 1.0, 1.0, 1.0, 0.5, 0.5])
    phi = r[:, None] * np.cos(np.pi * v)
    return (phi @ chroma).mean(axis=1)


def librosa_mel_mfcc(y: np.ndarray, sr: int) -> tuple[np.ndarray, np.ndarray]:
    import librosa

    mel = librosa.feature.melspectrogram(
        y=y, sr=sr, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, pad_mode="constant"
    )
    mfcc = librosa.feature.mfcc(
        y=y, sr=sr, n_fft=N_FFT, hop_length=HOP, n_mels=N_MELS, n_mfcc=N_MFCC,
        pad_mode="constant",
    )
    return mel.mean(axis=1), mfcc.mean(axis=1)


def librosa_chroma(y: np.ndarray, sr: int) -> np.ndarray:
    import librosa

    mag = np.abs(librosa.stft(y, n_fft=N_FFT, hop_length=HOP, pad_mode="constant"))
    return librosa.feature.chroma_stft(S=mag, sr=sr, n_fft=N_FFT).mean(axis=1)


def librosa_contrast(y: np.ndarray, sr: int) -> np.ndarray:
    import librosa

    mag = np.abs(librosa.stft(y, n_fft=N_FFT, hop_length=HOP, pad_mode="constant"))
    s_db = librosa.power_to_db(mag**2, ref=np.max)
    return librosa.feature.spectral_contrast(S=s_db, sr=sr, n_fft=N_FFT).mean(axis=1)


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use-librosa", action="store_true")
    parser.add_argument(
        "--output",
        type=Path,
        default=Path(__file__).resolve().parents[1]
        / "tests/fixtures/dsp/golden_features_v2.npz",
    )
    args = parser.parse_args()

    compute = librosa_mel_mfcc if args.use_librosa else independent_mel_mfcc
    compute_chroma = librosa_chroma if args.use_librosa else independent_chroma
    compute_contrast = librosa_contrast if args.use_librosa else independent_contrast
    arrays: dict[str, np.ndarray] = {}
    for sr in SAMPLE_RATES:
        for name, y in signals(sr).items():
            mel_mean, mfcc_mean = compute(y, sr)
            arrays[f"{name}_{sr}_mel"] = mel_mean.astype(np.float64)
            arrays[f"{name}_{sr}_mfcc"] = mfcc_mean.astype(np.float64)
            arrays[f"{name}_{sr}_chroma"] = compute_chroma(y, sr).astype(np.float64)
            arrays[f"{name}_{sr}_contrast"] = compute_contrast(y, sr).astype(np.float64)
            # Tonnetz golden is ALWAYS the independent rederivation of the
            # repo's documented pseudo-CQT algorithm (the deliberate design
            # deviation from librosa's istft+CQT path — see independent_tonnetz).
            arrays[f"{name}_{sr}_tonnetz"] = independent_tonnetz(y, sr).astype(np.float64)

    args.output.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(args.output, **arrays)
    meta = {
        "source": "librosa" if args.use_librosa else "independent-numpy",
        "n_fft": N_FFT,
        "hop": HOP,
        "n_mels": N_MELS,
        "n_mfcc": N_MFCC,
        "sample_rates": SAMPLE_RATES,
        "seconds": SECONDS,
        "families": ["mel", "mfcc", "chroma", "contrast", "tonnetz"],
        "tonnetz_source": "independent-numpy (repo-documented pseudo-CQT algorithm)",
        "note": (
            "Regenerate with --use-librosa on a librosa-equipped machine to "
            "upgrade mel/mfcc/chroma/contrast to true librosa goldens; key "
            "layout is identical. Tonnetz stays pinned to the documented "
            "pseudo-CQT design (deliberate deviation from librosa)."
        ),
    }
    args.output.with_suffix(".json").write_text(
        json.dumps(meta, indent=2), encoding="utf-8"
    )
    print(f"Wrote {len(arrays)} fixture arrays to {args.output} ({meta['source']}).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
