"""REPET-SIM vocal separation: the demucs-lane stand-in must actually separate."""

import numpy as np

from ser_tpu._internal.utils.source_separation import separate_vocals

SR = 16000


def _repeating_music(seconds: float, *, loop_seconds: float = 0.5) -> np.ndarray:
    """A deterministic chord loop — the repeating background REPET models."""
    rng = np.random.default_rng(7)
    loop_t = np.arange(int(loop_seconds * SR)) / SR
    loop = sum(
        amp * np.sin(2 * np.pi * freq * loop_t + rng.uniform(0, 2 * np.pi))
        for freq, amp in ((220.0, 0.5), (277.2, 0.35), (329.6, 0.3), (440.0, 0.2))
    )
    reps = int(np.ceil(seconds / loop_seconds))
    return np.tile(loop, reps)[: int(seconds * SR)].astype(np.float64)


def _speechlike(seconds: float) -> np.ndarray:
    """Non-repeating utterance bursts standing in for speech.

    Every ~0.35 s burst draws its own pitch, harmonic mix, chirp slope, and
    fricative-noise level, so no two frames far apart are spectrally similar
    — the property REPET relies on to keep speech out of the background.
    """
    rng = np.random.default_rng(3)
    total = int(seconds * SR)
    signal = np.zeros(total)
    burst = int(0.35 * SR)
    position = 0
    while position < total:
        length = min(burst, total - position)
        t = np.arange(length) / SR
        f0 = rng.uniform(100.0, 320.0)
        slope = rng.uniform(-80.0, 80.0)
        phase = 2 * np.pi * (f0 * t + 0.5 * slope * t * t)
        tone = sum(
            rng.uniform(0.1, 0.6) * np.sin(h * phase + rng.uniform(0, 2 * np.pi))
            for h in (1, 2, 3, 4)
        )
        noise = rng.uniform(0.05, 0.3) * rng.standard_normal(length)
        envelope = np.minimum(1.0, t / 0.03) * np.minimum(1.0, (length / SR - t) / 0.05)
        gated = rng.uniform(0.4, 1.0) if rng.uniform() > 0.25 else 0.0  # pauses
        signal[position : position + length] = gated * envelope * (tone + noise)
        position += length
    return signal


def _si_snr(estimate: np.ndarray, target: np.ndarray) -> float:
    """Scale-invariant SNR of ``estimate`` against ``target`` (dB)."""
    target = target - target.mean()
    estimate = estimate - estimate.mean()
    scale = float(np.dot(estimate, target) / (np.dot(target, target) + 1e-12))
    projection = scale * target
    noise = estimate - projection
    return 10.0 * float(
        np.log10((np.dot(projection, projection) + 1e-12) / (np.dot(noise, noise) + 1e-12))
    )


class TestSeparation:
    def test_vocals_recover_from_music_mixture(self):
        seconds = 6.0
        speech = _speechlike(seconds)
        music = _repeating_music(seconds)
        mixture = (speech + music).astype(np.float32)
        vocals = separate_vocals(mixture, SR)
        assert vocals.shape == mixture.shape
        snr_before = _si_snr(mixture.astype(np.float64), speech)
        snr_after = _si_snr(vocals.astype(np.float64), speech)
        # The whole point of the demucs lane: separation must IMPROVE the
        # vocal estimate markedly, not just attenuate everything.
        assert snr_after > snr_before + 3.0, (snr_before, snr_after)

    def test_music_energy_is_attenuated(self):
        seconds = 6.0
        music = _repeating_music(seconds).astype(np.float32)
        residual = separate_vocals(music, SR)
        assert float(np.mean(residual**2)) < 0.25 * float(np.mean(music**2))

    def test_clean_speech_mostly_passes_through(self):
        seconds = 6.0
        speech = _speechlike(seconds).astype(np.float32)
        vocals = separate_vocals(speech, SR)
        assert _si_snr(vocals.astype(np.float64), speech) > 5.0

    def test_short_and_silent_inputs_pass_through(self):
        short = np.ones(256, dtype=np.float32)
        np.testing.assert_array_almost_equal(separate_vocals(short, SR), short)
        silent = np.zeros(SR, dtype=np.float32)
        np.testing.assert_array_equal(separate_vocals(silent, SR), silent)

    def test_long_input_segments_without_artifacts(self):
        seconds = 35.0  # crosses the 30 s segment boundary
        speech = _speechlike(seconds)
        music = _repeating_music(seconds)
        vocals = separate_vocals((speech + music).astype(np.float32), SR)
        assert vocals.shape[0] == int(seconds * SR)
        assert np.all(np.isfinite(vocals))
