"""Differential parity: pooled-window noise controls.

Reference stage: ``ser/_internal/models/medium_noise_controls.py:36-83`` —
RMS-of-std window scoring, min-std floor with single-window forced keep,
evenly spaced cap selection, and the full counter set. The surviving window
SET must match bitwise: it decides which windows train the head.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from ser_tpu._internal.models.noise_controls import apply_noise_controls


@st.composite
def pooled_matrices(draw):
    n_windows = draw(st.integers(min_value=1, max_value=60))
    half_dim = draw(st.sampled_from([1, 4, 16]))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.default_rng(seed)
    means = rng.standard_normal((n_windows, half_dim))
    # std half: mostly small positives with occasional near-zero rows so the
    # floor and forced-keep paths both exercise.
    stds = np.abs(rng.standard_normal((n_windows, half_dim))) * rng.choice(
        [0.001, 0.05, 1.0], size=(n_windows, 1)
    )
    pooled = np.concatenate([means, stds], axis=1)
    min_std = draw(st.sampled_from([0.0, 0.01, 0.05, 0.2, 5.0]))
    max_windows = draw(st.sampled_from([0, 1, 3, 10, 100]))
    return pooled, min_std, max_windows


@settings(max_examples=120, deadline=None)
@given(inputs=pooled_matrices())
def test_noise_control_selection_parity(oracle, inputs):
    pooled, min_std, max_windows = inputs
    kept, _, stats = apply_noise_controls(
        pooled, min_window_std=min_std, max_windows_per_clip=max_windows
    )
    theirs = oracle.call(
        "noise_controls",
        pooled=pooled,
        min_window_std=min_std,
        max_windows_per_clip=max_windows,
    )
    np.testing.assert_array_equal(kept, theirs["filtered"])
    assert stats.as_dict() == theirs["stats"]


def test_error_parity_on_odd_width(oracle):
    import pytest

    from reference_oracle import OracleRemoteError

    pooled = np.ones((3, 5))
    with pytest.raises(RuntimeError, match="even"):
        apply_noise_controls(pooled, min_window_std=0.1, max_windows_per_clip=0)
    with pytest.raises(OracleRemoteError, match="even"):
        oracle.call(
            "noise_controls", pooled=pooled, min_window_std=0.1, max_windows_per_clip=0
        )
