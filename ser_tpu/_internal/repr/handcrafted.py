"""Handcrafted DSP feature backend (fast profile).

Parity surface: reference ``ser/_internal/repr/handcrafted.py`` — same
``backend_id`` ("handcrafted"), feature dimensionality by flags, framing
(3 s / 1 s stride, truncated tails, skipped empty frames), and mean pooling.
The compute path is the batched TPU program in ``ser_tpu/ops``: the reference
loops librosa per frame; here all frames of a clip go through one jitted call.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from numpy.typing import NDArray

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu._internal.repr.backend import (
    EncodedSequence,
    FeatureMatrix,
    FeatureVector,
    PoolingWindow,
    overlap_frame_mask,
)
from ser_tpu.ops import features as ops_features


class HandcraftedBackend:
    """DSP feature backend over the fused TPU feature program."""

    def __init__(
        self,
        *,
        frame_size_seconds: float = 3,
        frame_stride_seconds: float = 1,
        feature_flags: FeatureFlags | None = None,
    ) -> None:
        if frame_size_seconds <= 0:
            raise ValueError("frame_size_seconds must be greater than zero.")
        if frame_stride_seconds <= 0:
            raise ValueError("frame_stride_seconds must be greater than zero.")
        self._frame_size_seconds = frame_size_seconds
        self._frame_stride_seconds = frame_stride_seconds
        self._feature_flags = feature_flags if feature_flags is not None else FeatureFlags()

    @property
    def backend_id(self) -> str:
        return "handcrafted"

    @property
    def feature_dim(self) -> int:
        return ops_features.feature_dim(self._feature_flags)

    def prepare_runtime(self) -> None:
        """No-op warmup hook (the jit cache warms on first encode)."""
        return None

    def encode_sequence(
        self, audio: NDArray[np.float32], sample_rate: int
    ) -> EncodedSequence:
        """Encodes audio into frame-level handcrafted features in one TPU call."""
        feats, starts, ends = ops_features.extract_frame_features(
            np.asarray(audio, dtype=np.float32),
            sample_rate,
            frame_size_seconds=self._frame_size_seconds,
            frame_stride_seconds=self._frame_stride_seconds,
            feature_flags=self._feature_flags,
        )
        return EncodedSequence(
            embeddings=feats.astype(np.float32, copy=False),
            frame_start_seconds=starts,
            frame_end_seconds=ends,
            backend_id=self.backend_id,
        )

    def pool(
        self, encoded: EncodedSequence, windows: Sequence[PoolingWindow]
    ) -> FeatureMatrix:
        """Mean-pools encoded frames per window (float64 accumulation)."""
        from ser_tpu._internal.repr.backend import window_mean_pool

        return window_mean_pool(encoded, windows)

    def extract_vector(
        self, audio: NDArray[np.float32], sample_rate: int
    ) -> FeatureVector:
        """Whole-clip feature vector for fast-profile training paths."""
        return ops_features.extract_feature_from_signal(
            np.asarray(audio, dtype=np.float32),
            sample_rate,
            feature_flags=self._feature_flags,
        )


__all__ = ["HandcraftedBackend"]
