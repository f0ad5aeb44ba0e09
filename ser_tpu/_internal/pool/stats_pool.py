"""Statistics pooling over encoded frame sequences.

Parity surface: reference ``ser/_internal/pool/stats_pool.py:15-43`` — mean+std
concatenation per window, float64, population std (ddof=0).

TPU note: for long sequences the masked means/stds can be computed as two
matmuls (window-mask matrix @ embeddings) on-device; the host loop here is the
deterministic fallback used by every profile and for bit-stable results.
"""

from __future__ import annotations

from collections.abc import Sequence

import numpy as np
from numpy.typing import NDArray

from ser_tpu._internal.repr import EncodedSequence, PoolingWindow, overlap_frame_mask

type PooledFeatureMatrix = NDArray[np.float64]


def mean_std_pool(
    encoded: EncodedSequence,
    windows: Sequence[PoolingWindow],
) -> PooledFeatureMatrix:
    """Pools encoded frames into per-window mean+std vectors, shape (W, 2*D).

    Embeddings still living on device (the ``SER_DEVICE_POOLING=1`` encode
    lane) pool on device and fetch only the (W, 2D) result — see
    :mod:`ser_tpu._internal.pool.device_pool`. Host numpy embeddings take
    the bit-stable float64 parity path below.
    """
    feature_dim = int(encoded.embeddings.shape[1])
    if not windows:
        return np.empty((0, feature_dim * 2), dtype=np.float64)
    if not isinstance(encoded.embeddings, np.ndarray):
        from ser_tpu._internal.pool.device_pool import device_mean_std_pool

        return device_mean_std_pool(encoded, windows)

    rows: list[NDArray[np.float64]] = []
    for window in windows:
        mask = overlap_frame_mask(encoded, window)
        selected = np.asarray(encoded.embeddings[mask], dtype=np.float64)
        rows.append(np.concatenate((selected.mean(axis=0), selected.std(axis=0))))
    return np.vstack(rows).astype(np.float64, copy=False)


__all__ = ["mean_std_pool"]
