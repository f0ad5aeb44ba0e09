"""Windowing + stats pooling tests (reference pool/ semantics)."""

import numpy as np
import pytest

from ser_tpu._internal.pool import mean_std_pool, temporal_pooling_windows
from ser_tpu._internal.repr import EncodedSequence, PoolingWindow, overlap_frame_mask


def encoded(n_frames=5, dim=4, frame_seconds=1.0):
    rng = np.random.default_rng(0)
    return EncodedSequence(
        embeddings=rng.standard_normal((n_frames, dim)).astype(np.float32),
        frame_start_seconds=np.arange(n_frames, dtype=np.float64) * frame_seconds,
        frame_end_seconds=(np.arange(n_frames, dtype=np.float64) + 1) * frame_seconds,
        backend_id="test",
    )


def test_windows_cover_clip_with_stride():
    windows = temporal_pooling_windows(
        encoded(5), window_size_seconds=1.0, window_stride_seconds=1.0
    )
    assert len(windows) == 5
    assert windows[0].start_seconds == 0.0
    assert windows[-1].end_seconds == 5.0


def test_short_clip_yields_single_window():
    windows = temporal_pooling_windows(
        encoded(2), window_size_seconds=5.0, window_stride_seconds=1.0
    )
    assert len(windows) == 1
    assert (windows[0].start_seconds, windows[0].end_seconds) == (0.0, 2.0)


def test_tail_window_completes_coverage():
    windows = temporal_pooling_windows(
        encoded(5), window_size_seconds=2.0, window_stride_seconds=1.5
    )
    assert windows[-1].end_seconds == 5.0


def test_mean_std_pool_shapes_and_values():
    seq = encoded(4, dim=3)
    windows = [PoolingWindow(0.0, 2.0), PoolingWindow(2.0, 4.0)]
    pooled = mean_std_pool(seq, windows)
    assert pooled.shape == (2, 6)
    first = seq.embeddings[:2].astype(np.float64)
    np.testing.assert_allclose(pooled[0, :3], first.mean(axis=0))
    np.testing.assert_allclose(pooled[0, 3:], first.std(axis=0))


def test_overlap_mask_boundaries_are_half_open():
    seq = encoded(3)
    mask = overlap_frame_mask(seq, PoolingWindow(1.0, 2.0))
    np.testing.assert_array_equal(mask, [False, True, False])


def test_out_of_range_window_raises():
    with pytest.raises(ValueError):
        overlap_frame_mask(encoded(3), PoolingWindow(0.0, 99.0))


def test_encoded_sequence_invariants():
    with pytest.raises(ValueError):
        EncodedSequence(
            embeddings=np.zeros((0, 4), dtype=np.float32),
            frame_start_seconds=np.zeros(0),
            frame_end_seconds=np.zeros(0),
            backend_id="x",
        )
    with pytest.raises(ValueError):
        EncodedSequence(
            embeddings=np.zeros((2, 4), dtype=np.float32),
            frame_start_seconds=np.array([0.0, 1.0]),
            frame_end_seconds=np.array([0.5, 1.0]),  # end <= start on frame 1
            backend_id="x",
        )
