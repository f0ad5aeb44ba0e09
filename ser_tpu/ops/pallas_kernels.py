"""Pallas TPU kernels + conv-STFT for the hot mel frontend.

The Whisper mel frontend is the flagship profile's hot loop (SURVEY §3.1 "hot
loops"): every 30 s window runs STFT(400/160) → power → mel(128) → log. Two
TPU-native rewrites live here:

1. ``conv_stft``: the STFT expressed as one strided convolution whose output
   channels are the windowed DFT basis — MXU work instead of jnp.fft, and the
   (B, T, 400) window tensor is never materialized.
2. ``power_mel_log`` (Pallas): fuses |spec|² → mel projection → log10 in VMEM
   so the (B, T, 402) spectrum is read once from HBM and only the (B, T, 128)
   log-mel ever gets written back. Grid tiles frames; the mel filterbank is
   zero-padded to lane-aligned shapes (``pallas_guide.md`` tiling constraints).

Both have jnp reference implementations; CPU paths use the references
(Pallas interpret mode is test-only).
"""

from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ser_tpu.ops import filters

_LANE = 128


def _round_up(value: int, multiple: int) -> int:
    return ((value + multiple - 1) // multiple) * multiple


@lru_cache(maxsize=8)
def _dft_conv_kernel(n_fft: int) -> np.ndarray:
    """Windowed DFT basis as a conv kernel: (n_fft, 1, 2*(n_fft//2+1)).

    Output channels are [real_0..real_K, imag_0..imag_K] of the Hann-windowed
    DFT, so ``conv(x, kernel, stride=hop)`` IS the (uncentered) STFT.
    """
    n_bins = n_fft // 2 + 1
    window = filters.hann_window(n_fft).astype(np.float64)
    k = np.arange(n_bins)[None, :]
    n = np.arange(n_fft)[:, None]
    angle = -2.0 * np.pi * k * n / n_fft
    real = np.cos(angle) * window[:, None]
    imag = np.sin(angle) * window[:, None]
    return np.concatenate([real, imag], axis=1).astype(np.float32)[:, None, :].transpose(
        0, 1, 2
    )


def conv_stft(
    waveform: jax.Array, n_fft: int, hop_length: int, *, center_pad: str = "reflect"
) -> jax.Array:
    """STFT via strided convolution. (B, S) → (B, T, 2*n_bins) [re | im].

    T = 1 + S // hop (librosa/Whisper center framing).
    """
    pad = n_fft // 2
    padded = jnp.pad(waveform, ((0, 0), (pad, pad)), mode=center_pad)
    # Trim so output frames == 1 + S//hop exactly.
    n_frames = 1 + waveform.shape[1] // hop_length
    needed = (n_frames - 1) * hop_length + n_fft
    padded = padded[:, :needed]
    kernel = jnp.asarray(_dft_conv_kernel(n_fft))  # (n_fft, 1, 2*bins)
    return jax.lax.conv_general_dilated(
        padded[:, :, None],
        kernel,
        window_strides=(hop_length,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    )


@lru_cache(maxsize=8)
def _padded_mel_fb(sr: int, n_fft: int, n_mels: int) -> np.ndarray:
    """Mel filterbank padded to lane-aligned (bins_pad, mels_pad) layout."""
    fb = filters.mel_filterbank(sr, n_fft, n_mels)  # (n_mels, n_bins)
    n_bins = fb.shape[1]
    bins_pad = _round_up(n_bins, _LANE)
    mels_pad = _round_up(n_mels, _LANE)
    out = np.zeros((bins_pad, mels_pad), dtype=np.float32)
    out[:n_bins, :n_mels] = fb.T
    return out


def _power_mel_log_kernel_3d(spec_ref, fb_ref, out_ref, *, n_bins: int):
    """3-D block variant: refs carry a leading singleton batch dim."""
    bins_pad = fb_ref.shape[0]
    real = spec_ref[0, :, :bins_pad]
    imag = spec_ref[0, :, bins_pad:]
    power = real * real + imag * imag
    mel = jnp.dot(power, fb_ref[:, :], preferred_element_type=jnp.float32)
    out_ref[0, :, :] = jnp.log10(jnp.maximum(mel, 1e-10))


def fused_log_mel(
    waveform: jax.Array,
    *,
    sr: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
    interpret: bool = False,
) -> jax.Array:
    """Whisper-normalized log-mel via conv-STFT + the fused Pallas stage.

    (B, S) → (B, 1 + S//hop, n_mels), matching
    ``models/whisper.log_mel_spectrogram`` numerics: log10-clamped mel, dynamic
    -range floor at max-8, then (x+4)/4.
    """
    log_mel = fused_log_mel_raw(
        waveform,
        sr=sr,
        n_fft=n_fft,
        hop_length=hop_length,
        n_mels=n_mels,
        interpret=interpret,
    )
    floor = jnp.max(log_mel, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_mel, floor) + 4.0) / 4.0


def fused_log_mel_raw(
    waveform: jax.Array,
    *,
    sr: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
    n_frames_out: int | None = None,
    interpret: bool = False,
) -> jax.Array:
    """log10-clamped mel power (no dynamic-range floor/affine), fused on TPU."""
    spec = conv_stft(waveform, n_fft, hop_length)
    n_frames = spec.shape[1]
    keep = n_frames_out if n_frames_out is not None else n_frames
    tile = 250 if n_frames % 250 == 0 else 256
    padded_frames = _round_up(n_frames, tile)
    if padded_frames != n_frames:
        spec = jnp.pad(spec, ((0, 0), (0, padded_frames - n_frames), (0, 0)))
    log_mel = _power_mel_log_call(
        spec, sr=sr, n_fft=n_fft, n_mels=n_mels, tile_frames=tile, interpret=interpret
    )
    return log_mel[:, :keep, :]


def _power_mel_log_call(spec, *, sr, n_fft, n_mels, tile_frames, interpret):
    batch, n_frames, two_bins = spec.shape
    n_bins = two_bins // 2
    fb = _padded_mel_fb(sr, n_fft, n_mels)
    bins_pad, mels_pad = fb.shape
    spec_padded = jnp.zeros((batch, n_frames, 2 * bins_pad), dtype=jnp.float32)
    spec_padded = spec_padded.at[:, :, :n_bins].set(spec[:, :, :n_bins])
    spec_padded = spec_padded.at[:, :, bins_pad : bins_pad + n_bins].set(
        spec[:, :, n_bins:]
    )
    out = pl.pallas_call(
        partial(_power_mel_log_kernel_3d, n_bins=n_bins),
        out_shape=jax.ShapeDtypeStruct((batch, n_frames, mels_pad), jnp.float32),
        grid=(batch, n_frames // tile_frames),
        in_specs=[
            pl.BlockSpec(
                (1, tile_frames, 2 * bins_pad),
                lambda b, t: (b, t, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (bins_pad, mels_pad), lambda b, t: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_frames, mels_pad), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(spec_padded, jnp.asarray(fb))
    return out[:, :, :n_mels]


def reference_log_mel(
    waveform: jax.Array,
    *,
    sr: int = 16000,
    n_fft: int = 400,
    hop_length: int = 160,
    n_mels: int = 128,
) -> jax.Array:
    """Pure-jnp reference for :func:`fused_log_mel` (rfft-based, reflect pad)."""
    pad = n_fft // 2
    padded = jnp.pad(waveform, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + waveform.shape[1] // hop_length
    starts = np.arange(n_frames) * hop_length
    idx = starts[:, None] + np.arange(n_fft)[None, :]
    window = jnp.asarray(filters.hann_window(n_fft))
    frames = padded[:, idx] * window[None, None, :]
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    power = jnp.abs(spec) ** 2
    fb = jnp.asarray(filters.mel_filterbank(sr, n_fft, n_mels))
    mel = jnp.einsum("btf,mf->btm", power, fb)
    log_mel = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_mel, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_mel, floor) + 4.0) / 4.0


__all__ = ["conv_stft", "fused_log_mel", "fused_log_mel_raw", "reference_log_mel"]
