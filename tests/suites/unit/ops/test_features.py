"""Feature-orchestration tests: framing, bucketing invariance, flag dims."""

import numpy as np
import pytest

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu.ops import features

SR = 16000


def _clip(seconds: float, seed: int = 0) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    return (
        0.4 * np.sin(2 * np.pi * 220 * t) + 0.05 * rng.standard_normal(t.size)
    ).astype(np.float32)


def test_frame_plan_matches_reference_semantics():
    feats, starts, ends = features.extract_frame_features(_clip(3.5), SR)
    # 3.5 s clip, 3 s frames, 1 s stride → frames at 0,1,2,3 with truncation.
    np.testing.assert_allclose(starts, [0.0, 1.0, 2.0, 3.0])
    np.testing.assert_allclose(ends, [3.0, 3.5, 3.5, 3.5])
    assert feats.shape == (4, 193)
    assert np.all(np.isfinite(feats))


def test_feature_dim_by_flags():
    assert features.feature_dim(FeatureFlags()) == 193
    assert features.feature_dim(FeatureFlags(tonnetz=False)) == 187
    assert (
        features.feature_dim(
            FeatureFlags(mfcc=True, chroma=False, mel=False, contrast=False, tonnetz=False)
        )
        == 40
    )


def test_flag_subset_is_prefix_consistent():
    clip = _clip(2.0, seed=3)
    full = features.extract_feature_from_signal(clip, SR)
    mfcc_only = features.extract_feature_from_signal(
        clip,
        SR,
        feature_flags=FeatureFlags(chroma=False, mel=False, contrast=False, tonnetz=False),
    )
    np.testing.assert_allclose(mfcc_only, full[:40], rtol=1e-5, atol=1e-5)


def test_bucket_padding_is_exact():
    """Masked computation on a padded buffer equals exact-length computation."""
    clip = _clip(1.0, seed=4)  # 16000 samples < 16384 bucket → padded path
    flags = FeatureFlags(tonnetz=False)  # keep runtime modest
    padded_result = features.extract_feature_from_signal(clip, SR, feature_flags=flags)
    # Direct batched call with zero extra padding (L == true length).
    direct = features._batched_features(
        clip[None, :], np.asarray([clip.size], dtype=np.int32), SR, flags
    )[0]
    np.testing.assert_allclose(padded_result, direct, rtol=2e-4, atol=2e-4)


def test_small_signal_paths():
    tiny = _clip(0.02, seed=5)  # 320 samples → padded to 512, n_fft=512
    vec = features.extract_feature_from_signal(tiny, SR)
    assert vec.shape == (193,)
    assert np.all(np.isfinite(vec))
    mid = _clip(0.1, seed=6)  # 1600 samples → n_fft=1600 (between 512 and 2048)
    vec2 = features.extract_feature_from_signal(mid, SR)
    assert vec2.shape == (193,)
    assert np.all(np.isfinite(vec2))


def test_validation_errors():
    with pytest.raises(ValueError):
        features.extract_feature_from_signal(np.zeros((2, 2), dtype=np.float32), SR)
    with pytest.raises(ValueError):
        features.extract_feature_from_signal(np.zeros(0, dtype=np.float32), SR)
    with pytest.raises(ValueError):
        features.extract_feature_from_signal(_clip(1.0), 0)
    bad = _clip(1.0).copy()
    bad[5] = np.nan
    with pytest.raises(ValueError):
        features.extract_feature_from_signal(bad, SR)
