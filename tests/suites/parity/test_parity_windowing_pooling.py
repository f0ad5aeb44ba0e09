"""Differential parity: pooling windows, overlap masks, mean+std pooling.

Reference stages: ``ser/_internal/pool/windowing.py:10-71`` (stride cursor +
tail completion), ``ser/_internal/repr/backend.py:81-111`` (overlap mask +
bounds errors), ``ser/_internal/pool/stats_pool.py:15-43`` (float64 mean+std).
Window boundaries must match BIT FOR BIT: serialized timestamps come straight
from these floats, and the reference's sequential `cursor += stride`
accumulation is the exact sequence the repo must reproduce.
"""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from reference_oracle import OracleRemoteError
from ser_tpu._internal.pool.stats_pool import mean_std_pool
from ser_tpu._internal.pool.windowing import temporal_pooling_windows
from ser_tpu._internal.repr import EncodedSequence, PoolingWindow, overlap_frame_mask

finite_seconds = st.floats(
    min_value=0.01, max_value=40.0, allow_nan=False, allow_infinity=False
)


@st.composite
def frame_grids(draw) -> tuple[list[float], list[float]]:
    """Contiguous frame grids like real encoders emit (start/end per frame)."""
    count = draw(st.integers(min_value=1, max_value=200))
    frame_seconds = draw(
        st.sampled_from([0.02, 0.025, 0.1 / 3.0, 0.05, 0.1, 0.25, 1.0])
    )
    offset = draw(st.sampled_from([0.0, 0.013, 0.5]))
    starts = [offset + index * frame_seconds for index in range(count)]
    ends = [offset + (index + 1) * frame_seconds for index in range(count)]
    return starts, ends


def _encoded(starts: list[float], ends: list[float], dim: int = 1) -> EncodedSequence:
    return EncodedSequence(
        embeddings=np.zeros((len(starts), dim), dtype=np.float32),
        frame_start_seconds=np.asarray(starts, dtype=np.float64),
        frame_end_seconds=np.asarray(ends, dtype=np.float64),
        backend_id="oracle",
    )


@settings(max_examples=200, deadline=None)
@given(
    grid=frame_grids(),
    window_size=st.sampled_from([0.1, 0.5, 1.0, 1.5, 2.0, 3.0, 7.3]),
    stride=st.sampled_from([0.1, 0.25, 0.5, 1.0, 1.7, 2.0]),
)
def test_windowing_bitwise_parity(oracle, grid, window_size, stride):
    starts, ends = grid
    reference = oracle.call(
        "windows",
        frame_starts=starts,
        frame_ends=ends,
        window_size_seconds=window_size,
        window_stride_seconds=stride,
    )
    repo = temporal_pooling_windows(
        _encoded(starts, ends),
        window_size_seconds=window_size,
        window_stride_seconds=stride,
    )
    assert [(window.start_seconds, window.end_seconds) for window in repo] == reference


@pytest.mark.parametrize(
    ("window_size", "stride"),
    [(0.0, 1.0), (-1.0, 1.0), (float("nan"), 1.0), (1.0, 0.0), (1.0, float("inf"))],
)
def test_windowing_validation_parity(oracle, window_size, stride):
    starts, ends = [0.0, 1.0], [1.0, 2.0]
    with pytest.raises(OracleRemoteError) as reference_error:
        oracle.call(
            "windows",
            frame_starts=starts,
            frame_ends=ends,
            window_size_seconds=window_size,
            window_stride_seconds=stride,
        )
    with pytest.raises(ValueError):
        temporal_pooling_windows(
            _encoded(starts, ends),
            window_size_seconds=window_size,
            window_stride_seconds=stride,
        )
    assert reference_error.value.error_type == "ValueError"


@settings(max_examples=100, deadline=None)
@given(grid=frame_grids(), data=st.data())
def test_overlap_mask_parity(oracle, grid, data):
    starts, ends = grid
    clip_start, clip_end = starts[0], ends[-1]
    window_start = data.draw(
        st.floats(min_value=clip_start, max_value=clip_end - 1e-6, allow_nan=False)
    )
    window_end = data.draw(
        st.floats(min_value=window_start + 1e-6, max_value=clip_end, allow_nan=False)
    )
    window = (window_start, window_end)
    try:
        reference = oracle.call(
            "overlap_mask", frame_starts=starts, frame_ends=ends, window=window
        )
        reference_error = None
    except OracleRemoteError as error:
        reference, reference_error = None, error

    try:
        repo = overlap_frame_mask(
            _encoded(starts, ends),
            PoolingWindow(start_seconds=window_start, end_seconds=window_end),
        ).tolist()
        repo_error = None
    except ValueError as error:
        repo, repo_error = None, error

    if reference_error is None:
        assert repo_error is None
        assert repo == reference
    else:
        assert repo_error is not None
        assert reference_error.error_type == "ValueError"


@settings(max_examples=75, deadline=None)
@given(
    grid=frame_grids(),
    dim=st.integers(min_value=1, max_value=8),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    window_size=st.sampled_from([0.5, 1.0, 2.0]),
    stride=st.sampled_from([0.5, 1.0]),
)
def test_mean_std_pool_bitwise_parity(oracle, grid, dim, seed, window_size, stride):
    """Pooled float64 matrices match bit for bit on identical float32 inputs."""
    starts, ends = grid
    rng = np.random.default_rng(seed)
    embeddings = rng.standard_normal((len(starts), dim)).astype(np.float32)
    encoded = _encoded(starts, ends, dim)
    encoded = EncodedSequence(
        embeddings=embeddings,
        frame_start_seconds=encoded.frame_start_seconds,
        frame_end_seconds=encoded.frame_end_seconds,
        backend_id="oracle",
    )
    windows = temporal_pooling_windows(
        encoded, window_size_seconds=window_size, window_stride_seconds=stride
    )
    window_tuples = [(window.start_seconds, window.end_seconds) for window in windows]
    reference = oracle.call(
        "pool",
        embeddings=embeddings,
        frame_starts=starts,
        frame_ends=ends,
        windows=window_tuples,
    )
    repo = mean_std_pool(encoded, windows)
    assert repo.dtype == reference.dtype
    assert repo.shape == reference.shape
    assert np.array_equal(repo, reference)
