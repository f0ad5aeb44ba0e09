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


def main() -> int:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--use-librosa", action="store_true")
    parser.add_argument(
        "--output",
        type=Path,
        default=Path(__file__).resolve().parents[1]
        / "tests/fixtures/dsp/golden_mel_mfcc_v1.npz",
    )
    args = parser.parse_args()

    compute = librosa_mel_mfcc if args.use_librosa else independent_mel_mfcc
    arrays: dict[str, np.ndarray] = {}
    for sr in SAMPLE_RATES:
        for name, y in signals(sr).items():
            mel_mean, mfcc_mean = compute(y, sr)
            arrays[f"{name}_{sr}_mel"] = mel_mean.astype(np.float64)
            arrays[f"{name}_{sr}_mfcc"] = mfcc_mean.astype(np.float64)

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
        "note": (
            "Regenerate with --use-librosa on a librosa-equipped machine to "
            "upgrade to true librosa goldens; key layout is identical."
        ),
    }
    args.output.with_suffix(".json").write_text(
        json.dumps(meta, indent=2), encoding="utf-8"
    )
    print(f"Wrote {len(arrays)} fixture arrays to {args.output} ({meta['source']}).")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
