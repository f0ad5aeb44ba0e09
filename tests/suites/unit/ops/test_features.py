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


def test_tonnetz_invariant_to_length_bucket():
    """The HPSS time-median must not read zero-pad columns: the same clip in
    a wider bucket previously shifted tonnetz ~10% (train/serve skew when a
    clip's length crossed a bucket boundary)."""
    import jax.numpy as jnp

    from ser_tpu.ops.dsp import handcrafted_features_batch

    rng = np.random.default_rng(0)
    clip = rng.standard_normal(16384).astype(np.float32)
    outputs = []
    for width in (16384, 32768):
        buffer = np.zeros((1, width), np.float32)
        buffer[0, : clip.size] = clip
        outputs.append(
            np.asarray(
                handcrafted_features_batch(
                    jnp.asarray(buffer),
                    jnp.asarray([clip.size]),
                    sr=48000,
                    n_fft=2048,
                    hop_length=512,
                    mfcc=False,
                    chroma=False,
                    mel=False,
                    contrast=False,
                    tonnetz=True,
                )
            )
        )
    np.testing.assert_array_equal(outputs[0], outputs[1])


def test_bulk_extraction_chunks_match_single_batch(monkeypatch):
    """Row-capped device batches must be feature-identical to one batch."""
    from ser_tpu.ops import features as feats

    rng = np.random.default_rng(1)
    clips = [
        (rng.standard_normal(24000).astype(np.float32) * 0.3, 16000)
        for _ in range(5)
    ]
    full = feats.extract_feature_vectors_batch(clips)
    monkeypatch.setattr(feats, "_MAX_DEVICE_ROWS", 2)
    chunked = feats.extract_feature_vectors_batch(clips)
    np.testing.assert_array_equal(full, chunked)


def test_frame_extraction_chunks_match_single_batch(monkeypatch):
    from ser_tpu.ops import features as feats

    rng = np.random.default_rng(2)
    audio = (0.3 * rng.standard_normal(16000 * 8)).astype(np.float32)
    full, s1, e1 = feats.extract_frame_features(audio, 16000)
    monkeypatch.setattr(feats, "_MAX_DEVICE_ROWS", 3)
    chunked, s2, e2 = feats.extract_frame_features(audio, 16000)
    np.testing.assert_array_equal(full, chunked)
    np.testing.assert_array_equal(s1, s2)


def test_device_framed_features_bitwise_match_host_framed(monkeypatch):
    """SER_FAST_DEVICE_FRAMING ships the raw clip and gathers frames on
    device; the frame rows it rebuilds must be bit-identical to the
    host-assembled path, so the feature outputs must be too."""
    import os

    from ser_tpu.ops.features import extract_frame_features

    rng = np.random.default_rng(17)
    audio = (0.2 * rng.standard_normal(int(7.3 * 16000))).astype(np.float32)

    monkeypatch.setenv("SER_FAST_DEVICE_FRAMING", "1")
    dev_feats, dev_starts, dev_ends = extract_frame_features(audio, 16000)
    monkeypatch.setenv("SER_FAST_DEVICE_FRAMING", "0")
    host_feats, host_starts, host_ends = extract_frame_features(audio, 16000)

    np.testing.assert_array_equal(dev_feats, host_feats)
    np.testing.assert_array_equal(dev_starts, host_starts)
    np.testing.assert_array_equal(dev_ends, host_ends)
