"""Per-owner tests for ``_internal/models/noise_controls.py``.

Behavior spec: reference ``ser/_internal/models/medium_noise_controls.py`` —
RMS-of-std scoring, forced keep, evenly spaced cap, counter merging.
"""

from __future__ import annotations

import numpy as np
import pytest

from ser_tpu._internal.models.noise_controls import (
    NoiseControlStats,
    apply_noise_controls,
)


def _pooled(stds: list[float], half_dim: int = 2) -> np.ndarray:
    """Rows whose std-half RMS equals the given scores exactly."""
    n = len(stds)
    means = np.zeros((n, half_dim))
    std_half = np.tile(np.asarray(stds)[:, None], (1, half_dim))
    return np.concatenate([means, std_half], axis=1)


class TestFloor:
    def test_scoring_is_rms_not_mean(self):
        # std half [0.3, 0.0]: mean 0.15 but RMS sqrt(0.09/2)=0.212 — a
        # mean-based filter at 0.2 would drop it; the RMS rule keeps it.
        pooled = np.array([[0.0, 0.0, 0.3, 0.0]])
        kept, _, stats = apply_noise_controls(
            pooled, min_window_std=0.2, max_windows_per_clip=0
        )
        assert stats.kept_windows == 1 and stats.forced_keep_windows == 0

    def test_low_std_windows_drop(self):
        kept, indices, stats = apply_noise_controls(
            _pooled([0.5, 0.001, 0.4]), min_window_std=0.1, max_windows_per_clip=0
        )
        assert indices.tolist() == [0, 2]
        assert stats.dropped_low_std_windows == 1

    def test_all_failing_forces_best_window(self):
        kept, indices, stats = apply_noise_controls(
            _pooled([0.01, 0.03, 0.02]), min_window_std=0.5, max_windows_per_clip=0
        )
        assert indices.tolist() == [1]  # highest score survives
        assert stats.forced_keep_windows == 1
        assert stats.dropped_low_std_windows == 2

    def test_zero_floor_keeps_everything(self):
        _, indices, stats = apply_noise_controls(
            _pooled([0.0, 0.0]), min_window_std=0.0, max_windows_per_clip=0
        )
        assert indices.tolist() == [0, 1]
        assert stats.dropped_low_std_windows == 0


class TestCap:
    def test_cap_selects_evenly_spaced_not_prefix(self):
        _, indices, stats = apply_noise_controls(
            _pooled([1.0] * 10), min_window_std=0.0, max_windows_per_clip=3
        )
        assert indices.tolist() == [0, 4, 9]  # linspace over survivors
        assert stats.dropped_cap_windows == 7

    def test_cap_applies_after_floor(self):
        # Floor drops index 0; cap then spaces over the survivors.
        _, indices, _ = apply_noise_controls(
            _pooled([0.001] + [1.0] * 9), min_window_std=0.1, max_windows_per_clip=3
        )
        assert indices.tolist() == [1, 5, 9]

    def test_cap_of_zero_is_unlimited(self):
        kept, _, _ = apply_noise_controls(
            _pooled([1.0] * 5), min_window_std=0.0, max_windows_per_clip=0
        )
        assert kept.shape[0] == 5


class TestContract:
    def test_odd_width_rejected(self):
        with pytest.raises(RuntimeError, match="even"):
            apply_noise_controls(
                np.ones((2, 3)), min_window_std=0.0, max_windows_per_clip=0
            )

    def test_non_2d_rejected(self):
        with pytest.raises(RuntimeError):
            apply_noise_controls(
                np.ones((2,)), min_window_std=0.0, max_windows_per_clip=0
            )

    def test_stats_merge_is_fieldwise_sum(self):
        first = NoiseControlStats(10, 8, 1, 1, 0)
        second = NoiseControlStats(5, 2, 2, 1, 1)
        merged = first.merged(second)
        assert merged == NoiseControlStats(15, 10, 3, 2, 1)

    def test_kept_indices_parallel_to_rows(self):
        pooled = _pooled([0.5, 0.001, 0.4, 0.6])
        kept, indices, _ = apply_noise_controls(
            pooled, min_window_std=0.1, max_windows_per_clip=0
        )
        np.testing.assert_array_equal(kept, pooled[indices])
