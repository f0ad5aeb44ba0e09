"""Pure per-profile execution pass: encode → window → pool → predict → postprocess.

Parity surface: reference ``ser/_internal/runtime/medium_execution.py:52-98``
(and its accurate twin) generalized into ONE parameterized pass — the
reference duplicates this per profile; here the profile supplies the backend,
pooling strategy, and postprocessing config.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any, Literal

import numpy as np

from ser_tpu._internal.models.fast_path import predict_frames
from ser_tpu._internal.pool import mean_std_pool, temporal_pooling_windows
from ser_tpu._internal.repr import EncodedSequence, FeatureBackend, PoolingWindow, overlap_frame_mask
from ser_tpu._internal.runtime.postprocessing import (
    SegmentPostprocessingConfig,
    postprocess_frame_predictions,
)
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.runtime.schema import FramePrediction, InferenceResult

logger = get_logger(__name__)

type PoolingStrategy = Literal["mean", "mean_std"]


def _mean_pool(encoded: EncodedSequence, windows: list[PoolingWindow]) -> np.ndarray:
    if not isinstance(encoded.embeddings, np.ndarray):
        # Device-resident embeddings (SER_DEVICE_POOLING encode lane): the
        # mean half of the device pool is exactly the mean pooling.
        from ser_tpu._internal.pool.device_pool import device_mean_std_pool

        pooled = device_mean_std_pool(encoded, windows)
        return pooled[:, : pooled.shape[1] // 2]
    rows = []
    for window in windows:
        mask = overlap_frame_mask(encoded, window)
        rows.append(np.asarray(encoded.embeddings[mask], dtype=np.float64).mean(axis=0))
    return np.vstack(rows)


def run_windowed_inference_once(
    *,
    audio: np.ndarray,
    sample_rate: int,
    backend: FeatureBackend,
    model: Any,
    pool_window_size_seconds: float,
    pool_window_stride_seconds: float,
    pooling_strategy: PoolingStrategy,
    postprocessing_config: SegmentPostprocessingConfig,
    output_schema_version: str,
    expected_feature_size: int | None = None,
    encode_fn: Callable[[np.ndarray, int], EncodedSequence] | None = None,
) -> InferenceResult:
    """One deterministic windowed inference pass for transformer profiles."""
    encode = encode_fn if encode_fn is not None else backend.encode_sequence
    encoded = encode(audio, sample_rate)
    windows = temporal_pooling_windows(
        encoded,
        window_size_seconds=pool_window_size_seconds,
        window_stride_seconds=pool_window_stride_seconds,
    )
    if pooling_strategy == "mean_std":
        features = mean_std_pool(encoded, windows)
    else:
        features = _mean_pool(encoded, windows)

    if expected_feature_size is not None and features.shape[1] != expected_feature_size:
        raise ValueError(
            "Pooled feature size mismatch for loaded model. "
            f"Expected {expected_feature_size}, got {features.shape[1]}."
        )

    predicted, confidences, probabilities = predict_frames(
        model, features, len(windows), logger=logger
    )
    frames = [
        FramePrediction(
            start_seconds=float(window.start_seconds),
            end_seconds=float(window.end_seconds),
            emotion=predicted[i],
            confidence=confidences[i],
            probabilities=probabilities[i],
        )
        for i, window in enumerate(windows)
    ]
    segments = postprocess_frame_predictions(frames, config=postprocessing_config)
    return InferenceResult(
        schema_version=output_schema_version, segments=segments, frames=frames
    )


__all__ = ["PoolingStrategy", "run_windowed_inference_once"]
