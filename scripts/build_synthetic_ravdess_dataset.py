#!/usr/bin/env python
"""Deterministic synthetic RAVDESS dataset generator.

Parity surface: reference ``scripts/build_synthetic_ravdess_dataset.py`` — the
CI strategy of exercising the full train+infer workflow on a tiny generated
corpus of sine-wave WAVs with valid RAVDESS filenames, no downloads.

Each emotion code gets a distinct fundamental frequency plus harmonics and a
per-file deterministic phase/noise seed, so a classifier can actually separate
the classes.

Usage: python scripts/build_synthetic_ravdess_dataset.py OUTPUT_DIR \
    [--actors N] [--repetitions N] [--sample-rate HZ] [--seconds S]
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np

EMOTION_CODES = ("01", "02", "03", "04", "05", "06", "07", "08")
_BASE_FREQS = {code: 150.0 + 45.0 * i for i, code in enumerate(EMOTION_CODES)}


def synthesize_clip(
    emotion_code: str, seed: int, sample_rate: int, seconds: float
) -> np.ndarray:
    """One deterministic synthetic utterance for an emotion code."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * sample_rate)) / sample_rate
    base = _BASE_FREQS[emotion_code] * (1.0 + 0.02 * rng.standard_normal())
    signal = np.zeros_like(t)
    for harmonic, amplitude in ((1, 0.6), (2, 0.25), (3, 0.1)):
        signal += amplitude * np.sin(2 * np.pi * base * harmonic * t + rng.uniform(0, 2 * np.pi))
    # Amplitude envelope (attack/decay) so clips aren't pure stationary tones.
    envelope = np.minimum(1.0, t / 0.2) * np.minimum(1.0, (seconds - t) / 0.2)
    signal = signal * envelope + 0.01 * rng.standard_normal(t.size)
    return (0.8 * signal / np.max(np.abs(signal))).astype(np.float32)


def build_dataset(
    output_dir: Path,
    *,
    actors: int = 2,
    repetitions: int = 2,
    sample_rate: int = 16000,
    seconds: float = 3.2,
) -> list[Path]:
    """Writes the synthetic corpus; returns the generated file paths."""
    from ser_tpu._internal.utils.audio_io import write_wav

    written: list[Path] = []
    for actor in range(1, actors + 1):
        actor_dir = output_dir / f"Actor_{actor:02d}"
        actor_dir.mkdir(parents=True, exist_ok=True)
        for code in EMOTION_CODES:
            for repetition in range(1, repetitions + 1):
                # RAVDESS fields: modality-vocal-emotion-intensity-statement-rep-actor
                name = f"03-01-{code}-01-01-{repetition:02d}-{actor:02d}.wav"
                seed = actor * 1000 + int(code) * 10 + repetition
                clip = synthesize_clip(code, seed, sample_rate, seconds)
                path = actor_dir / name
                write_wav(path, clip, sample_rate)
                written.append(path)
    return written


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("output_dir", type=Path)
    parser.add_argument("--actors", type=int, default=2)
    parser.add_argument("--repetitions", type=int, default=2)
    parser.add_argument("--sample-rate", type=int, default=16000)
    parser.add_argument("--seconds", type=float, default=3.2)
    args = parser.parse_args()
    written = build_dataset(
        args.output_dir,
        actors=args.actors,
        repetitions=args.repetitions,
        sample_rate=args.sample_rate,
        seconds=args.seconds,
    )
    print(f"Wrote {len(written)} synthetic RAVDESS files under {args.output_dir}")


if __name__ == "__main__":
    main()
