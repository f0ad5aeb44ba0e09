"""Device-side pooling lane (``SER_DEVICE_POOLING=1``) parity and routing.

Why this lane exists: ``INFER_ACCURATE_r04.json`` shows the accurate serving
path is transfer-bound — ~50 ms encode compute vs 0.7-1.0 s fetching the
(3000, 1280) f32 frame matrix over the tunnel. Pooling on device fetches
``(n_windows, 2*dim)`` instead. The host float64 path stays the parity
default (reference ``ser/_internal/pool/stats_pool.py:15-43``); these tests
pin the documented f32-vs-f64 divergence (~1e-6 relative) and that the flag
actually keeps embeddings on device until the pooled fetch.
"""

from __future__ import annotations

import numpy as np
import pytest

from ser_tpu._internal.pool import mean_std_pool, temporal_pooling_windows
from ser_tpu._internal.pool.device_pool import (
    device_mean_std_pool,
    device_pooling_enabled,
    is_device_embeddings,
)
from ser_tpu._internal.repr.backend import EncodedSequence
from ser_tpu._internal.repr.wav2vec2_backend import XlsrBackend
from ser_tpu.models.wav2vec2 import Wav2Vec2Config

TINY = Wav2Vec2Config.tiny()


def _audio(seconds: float = 4.0, seed: int = 3) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (0.1 * rng.standard_normal(int(seconds * 16000))).astype(np.float32)


def _sequence(frames: int = 50, dim: int = 7, seed: int = 0, device: bool = False):
    rng = np.random.default_rng(seed)
    # Large common offset: the naive E[x^2]-E[x]^2 form would lose ~half the
    # f32 mantissa here; the shifted device kernel must not.
    embeddings = (5.0 + 0.05 * rng.standard_normal((frames, dim))).astype(np.float32)
    if device:
        import jax.numpy as jnp

        embeddings = jnp.asarray(embeddings)
    starts = np.arange(frames, dtype=np.float64) * 0.1
    return EncodedSequence(
        embeddings=embeddings,
        frame_start_seconds=starts,
        frame_end_seconds=starts + 0.1,
        backend_id="test",
    )


def test_device_pool_matches_host_f64_within_1e5():
    host = _sequence(device=False)
    dev = _sequence(device=True)
    windows = temporal_pooling_windows(
        host, window_size_seconds=1.0, window_stride_seconds=1.0
    )
    pooled_host = mean_std_pool(host, windows)
    pooled_dev = device_mean_std_pool(dev, windows)
    assert pooled_dev.shape == pooled_host.shape
    rel = np.abs(pooled_dev - pooled_host) / (np.abs(pooled_host) + 1e-9)
    # Documented divergence: f32 device arithmetic vs f64 host parity path.
    # Typically ~1e-6 relative; 1e-5 is the hard ceiling.
    assert float(rel.max()) < 1e-5


def test_mean_std_pool_dispatches_on_device_embeddings():
    dev = _sequence(device=True)
    windows = temporal_pooling_windows(
        dev, window_size_seconds=1.0, window_stride_seconds=1.0
    )
    pooled = mean_std_pool(dev, windows)
    assert isinstance(pooled, np.ndarray) and pooled.dtype == np.float64


def test_flag_keeps_encode_output_on_device(monkeypatch):
    monkeypatch.setenv("SER_DEVICE_POOLING", "1")
    assert device_pooling_enabled()
    backend = XlsrBackend(
        model_id="test/tiny", cache_root="/nonexistent", init="random", config=TINY
    )
    encoded = backend.encode_sequence(_audio(), 16000)
    assert is_device_embeddings(encoded.embeddings)
    windows = temporal_pooling_windows(
        encoded, window_size_seconds=1.0, window_stride_seconds=1.0
    )
    pooled = mean_std_pool(encoded, windows)
    assert pooled.shape == (len(windows), 2 * TINY.hidden_size)
    assert np.isfinite(pooled).all()


def test_default_path_stays_host_numpy(monkeypatch):
    monkeypatch.delenv("SER_DEVICE_POOLING", raising=False)
    backend = XlsrBackend(
        model_id="test/tiny", cache_root="/nonexistent", init="random", config=TINY
    )
    encoded = backend.encode_sequence(_audio(), 16000)
    assert isinstance(encoded.embeddings, np.ndarray)


def test_device_and_host_encode_agree(monkeypatch):
    """The device lane must not change WHICH frames are produced — only where
    they live. Same weights, same audio: identical frame matrix (up to f32
    representation) and pooled parity ~1e-6."""
    audio = _audio(6.5)

    monkeypatch.setenv("SER_DEVICE_POOLING", "1")
    dev_backend = XlsrBackend(
        model_id="test/tiny", cache_root="/nonexistent", init="random", config=TINY
    )
    encoded_dev = dev_backend.encode_sequence(audio, 16000)

    monkeypatch.delenv("SER_DEVICE_POOLING")
    host_backend = XlsrBackend(
        model_id="test/tiny", cache_root="/nonexistent", init="random", config=TINY
    )
    encoded_host = host_backend.encode_sequence(audio, 16000)

    np.testing.assert_array_equal(
        encoded_dev.frame_start_seconds, encoded_host.frame_start_seconds
    )
    np.testing.assert_allclose(
        np.asarray(encoded_dev.embeddings), encoded_host.embeddings, rtol=0, atol=0
    )

    windows = temporal_pooling_windows(
        encoded_host, window_size_seconds=1.0, window_stride_seconds=1.0
    )
    pooled_dev = mean_std_pool(encoded_dev, windows)
    pooled_host = mean_std_pool(encoded_host, windows)
    rel = np.abs(pooled_dev - pooled_host) / (np.abs(pooled_host) + 1e-9)
    assert float(rel.max()) < 1e-5
