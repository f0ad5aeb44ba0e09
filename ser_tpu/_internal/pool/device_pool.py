"""Device-side mean+std pooling — the ``SER_DEVICE_POOLING=1`` opt-in lane.

Why: ``INFER_ACCURATE_r04.json`` decomposes the accurate serving lane into
~50 ms of encode compute plus 0.7-1.0 s fetching the (3000, 1280) f32 frame
matrix over the remote tunnel (15.4 MB at 16-24 MB/s). Pooling on device
fetches ``(n_windows, 2*dim)`` instead — ~25x less traffic. The host float64
path (:mod:`ser_tpu._internal.pool.stats_pool`) stays the parity default;
semantics preserved from the reference
(``ser/_internal/pool/stats_pool.py:15-43``: mean+std concat per window,
population std ddof=0, half-open window/frame overlap).

Numerics: computed in f32 on the MXU with a global per-feature shift before
squaring (``E[(x-c)^2] - (E[x]-c)^2``), which removes the catastrophic
cancellation the naive ``E[x^2]-E[x]^2`` form suffers when ``|mean| >>
std``. The window masks are built on HOST in float64 through the same
``overlap_frame_mask`` the parity path uses (bit-identical frame selection),
then shipped as bools (~180 KB for a 60 s clip — 2 orders below the frame
matrix). Expected divergence vs host f64: ~1e-6 relative (pinned by
``test_device_pooling.py``).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ser_tpu._internal.repr import EncodedSequence, PoolingWindow, overlap_frame_mask

__all__ = ["device_mean_std_pool", "device_pooling_enabled", "is_device_embeddings"]


def device_pooling_enabled() -> bool:
    """True when the opt-in device pooling lane is requested."""
    return os.environ.get("SER_DEVICE_POOLING", "") == "1"


def is_device_embeddings(embeddings) -> bool:
    """True for embeddings living on device (jax.Array), not host numpy."""
    return isinstance(embeddings, jax.Array) and not isinstance(embeddings, np.ndarray)


@jax.jit
def _masked_mean_std(embeddings: jax.Array, mask: jax.Array) -> jax.Array:
    """(T, D) embeddings + (W, T) bool mask → (W, 2D) mean|std rows."""
    emb = embeddings.astype(jnp.float32)
    weights = mask.astype(jnp.float32)
    counts = jnp.maximum(weights.sum(axis=1, keepdims=True), 1.0)
    center = emb.mean(axis=0, keepdims=True)
    shifted = emb - center
    mean_shifted = (weights @ shifted) / counts
    sumsq = weights @ (shifted * shifted)
    variance = jnp.maximum(sumsq / counts - mean_shifted * mean_shifted, 0.0)
    return jnp.concatenate([mean_shifted + center, jnp.sqrt(variance)], axis=1)


def device_mean_std_pool(
    encoded: EncodedSequence, windows: Sequence[PoolingWindow]
) -> np.ndarray:
    """Pools device-resident embeddings per window; fetches only (W, 2D).

    Frame selection runs through the SAME host-side ``overlap_frame_mask``
    as the parity path (including its outside-range / empty-window
    validation), so which frames enter each window is bit-identical — only
    the mean/std arithmetic moves to f32 on device.
    """
    feature_dim = int(encoded.embeddings.shape[1])
    if not windows:
        return np.empty((0, feature_dim * 2), dtype=np.float64)
    mask_matrix = np.stack([overlap_frame_mask(encoded, w) for w in windows])
    pooled = _masked_mean_std(encoded.embeddings, jnp.asarray(mask_matrix))
    return np.asarray(pooled).astype(np.float64)
