"""Per-owner tests for the handcrafted DSP feature backend.

Parity surface: reference ``ser/_internal/repr/handcrafted.py`` — backend id,
flag-derived feature dimensionality, 3 s / 1 s framing with truncated tails,
and mean pooling. The TPU rebuild batches all frames of a clip through one
jitted feature program instead of looping librosa per frame.
"""

import numpy as np
import pytest

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu._internal.repr.backend import PoolingWindow
from ser_tpu._internal.repr.handcrafted import HandcraftedBackend

_SR = 22050


def _audio(seconds: float, *, freq: float = 220.0) -> np.ndarray:
    t = np.arange(int(seconds * _SR), dtype=np.float32) / _SR
    return (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)


def test_backend_id_and_default_feature_dim():
    backend = HandcraftedBackend()
    assert backend.backend_id == "handcrafted"
    # All five families on: 40 MFCC + 12 chroma + 128 mel + 7 contrast + 6
    # tonnetz = 193 (the reference's full fast-profile vector).
    assert backend.feature_dim == 193


@pytest.mark.parametrize(
    ("flags", "expected_dim"),
    [
        (FeatureFlags(mfcc=True, chroma=False, mel=False, contrast=False, tonnetz=False), 40),
        (FeatureFlags(mfcc=False, chroma=True, mel=False, contrast=False, tonnetz=False), 12),
        (FeatureFlags(mfcc=False, chroma=False, mel=True, contrast=False, tonnetz=False), 128),
        (FeatureFlags(mfcc=False, chroma=False, mel=False, contrast=True, tonnetz=False), 7),
        (FeatureFlags(mfcc=False, chroma=False, mel=False, contrast=False, tonnetz=True), 6),
        (FeatureFlags(mfcc=True, chroma=True, mel=False, contrast=False, tonnetz=False), 52),
    ],
)
def test_feature_dim_tracks_flags(flags, expected_dim):
    backend = HandcraftedBackend(feature_flags=flags)
    assert backend.feature_dim == expected_dim


@pytest.mark.parametrize("bad", [0.0, -1.0])
def test_non_positive_framing_rejected(bad):
    with pytest.raises(ValueError):
        HandcraftedBackend(frame_size_seconds=bad)
    with pytest.raises(ValueError):
        HandcraftedBackend(frame_stride_seconds=bad)


@pytest.fixture(scope="module")
def mfcc_backend():
    # MFCC-only keeps the jitted program small for the unit tier.
    return HandcraftedBackend(
        feature_flags=FeatureFlags(
            mfcc=True, chroma=False, mel=False, contrast=False, tonnetz=False
        )
    )


def test_encode_sequence_framing_contract(mfcc_backend):
    """5 s at 3 s / 1 s stride → one frame per stride, tail ends clamped."""
    encoded = mfcc_backend.encode_sequence(_audio(5.0), _SR)
    assert encoded.backend_id == "handcrafted"
    assert encoded.embeddings.shape == (5, 40)
    assert encoded.embeddings.dtype == np.float32
    np.testing.assert_allclose(encoded.frame_start_seconds, [0.0, 1.0, 2.0, 3.0, 4.0])
    np.testing.assert_allclose(encoded.frame_end_seconds, [3.0, 4.0, 5.0, 5.0, 5.0])
    assert np.isfinite(encoded.embeddings).all()


def test_encode_sequence_deterministic(mfcc_backend):
    audio = _audio(4.0)
    first = mfcc_backend.encode_sequence(audio, _SR)
    second = mfcc_backend.encode_sequence(audio, _SR)
    np.testing.assert_array_equal(first.embeddings, second.embeddings)


def test_pool_means_frames_per_window(mfcc_backend):
    encoded = mfcc_backend.encode_sequence(_audio(6.0), _SR)
    windows = [PoolingWindow(start_seconds=0.0, end_seconds=6.0)]
    pooled = mfcc_backend.pool(encoded, windows)
    assert pooled.shape == (1, 40)
    np.testing.assert_allclose(
        pooled[0], encoded.embeddings.mean(axis=0), rtol=1e-6, atol=1e-6
    )


def test_extract_vector_matches_feature_dim(mfcc_backend):
    vector = mfcc_backend.extract_vector(_audio(3.0), _SR)
    assert vector.shape == (40,)
    assert np.isfinite(vector).all()


def test_distinct_signals_produce_distinct_features(mfcc_backend):
    low = mfcc_backend.extract_vector(_audio(3.0, freq=110.0), _SR)
    high = mfcc_backend.extract_vector(_audio(3.0, freq=880.0), _SR)
    assert not np.allclose(low, high)
