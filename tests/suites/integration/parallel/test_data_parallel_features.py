"""Data-parallel feature extraction over the 8-device virtual mesh."""

import jax
import numpy as np

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu.ops.features import extract_feature_vectors_batch


def test_feature_batch_shards_across_devices_and_stays_exact():
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(0)
    sr = 16000
    clips = [
        ((0.4 * np.sin(2 * np.pi * (200 + 40 * i) * np.arange(sr) / sr)).astype(np.float32), sr)
        for i in range(5)  # 5 clips → padded to 8 (device count) internally
    ]
    flags = FeatureFlags(tonnetz=False)
    batch = extract_feature_vectors_batch(clips, feature_flags=flags)
    assert batch.shape == (5, 187)
    assert np.all(np.isfinite(batch))
    # Per-clip extraction must agree with the sharded batch result.
    from ser_tpu.ops.features import extract_feature_from_signal

    single = extract_feature_from_signal(clips[2][0], sr, feature_flags=flags)
    np.testing.assert_allclose(batch[2], single, rtol=2e-4, atol=2e-4)
