"""Host orchestration for handcrafted feature extraction.

Bridges variable-length audio onto the fixed-shape jitted program in
``ser_tpu/ops/dsp.py``:

- Clips are split into 3 s frames at 1 s stride (reference
  ``ser/_internal/repr/handcrafted.py:85-107``); all frames are processed in a
  **single batched jit call** at a fixed shape (zero-padded + column-masked),
  instead of the reference's sequential per-frame librosa loop.
- Whole-clip vectors (training path, reference ``handcrafted.py:124-137``) are
  padded up to shape buckets so jit compiles O(log n) programs, with masks
  keeping results exact for the true length.
- Frames shorter than 2048 samples replicate librosa's small-signal behavior
  (``dsp.py:38-45,96``: pad to >=512, n_fft=min(size, 2048), and the resulting
  mixed hop lengths) on a rare per-frame fallback path.
"""

from __future__ import annotations

import os

import numpy as np

import jax.numpy as jnp

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu._internal.utils.jax_runtime import ensure_compilation_cache
from ser_tpu.ops import dsp

ensure_compilation_cache()

_FFT_MIN_WINDOW = 512
_FULL_NFFT = 2048
_HOP = 512
_LENGTH_BUCKET = 16384  # whole-clip lengths round up to this multiple (~0.34 s @ 48 kHz)
#: Device-batch row cap: bounds transient HBM (the STFT window gather and the
#: 31-way HPSS median stack scale with rows x frame length) so hour-long
#: clips cannot OOM a single dispatch. The chunked calls share one compiled
#: program per (rows, length) shape.
_MAX_DEVICE_ROWS = 128


def feature_dim(flags: FeatureFlags) -> int:
    """Feature dimensionality for one flag set (reference handcrafted.py:46-59)."""
    return 40 * flags.mfcc + 12 * flags.chroma + 128 * flags.mel + 7 * flags.contrast + 6 * flags.tonnetz


def pad_audio_for_fft(audio: np.ndarray, minimum_window: int = _FFT_MIN_WINDOW) -> np.ndarray:
    """Zero-pads short clips so spectral features can be computed safely."""
    if audio.size >= minimum_window:
        return audio
    return np.pad(audio, (0, minimum_window - audio.size))


def _validate(audio: np.ndarray, sample_rate: int) -> None:
    if sample_rate <= 0:
        raise ValueError("Sample rate must be a positive integer.")
    if audio.ndim != 1:
        raise ValueError("Audio must be mono (1D array).")
    if audio.size == 0:
        raise ValueError("Audio contains no samples.")
    if not np.all(np.isfinite(audio)):
        raise ValueError("Audio buffer is not finite everywhere.")


def _next_pow2(n: int) -> int:
    return 1 << max(0, (n - 1).bit_length())


def _flag_kwargs(flags: FeatureFlags) -> dict[str, bool]:
    return {
        "mfcc": flags.mfcc,
        "chroma": flags.chroma,
        "mel": flags.mel,
        "contrast": flags.contrast,
        "tonnetz": flags.tonnetz,
    }


def _batched_features(
    frames: np.ndarray, lengths: np.ndarray, sample_rate: int, flags: FeatureFlags
) -> np.ndarray:
    """Runs the jitted batch program with batch-size bucketing.

    Multi-chip: when several accelerator devices are visible, the batch is
    sharded over the mesh's data axis and GSPMD splits the program — the
    TPU-native replacement for the reference's ``mp.Pool`` file parallelism
    (SURVEY §2.10 item 1).
    """
    import jax

    true_batch = frames.shape[0]
    n_devices = len(jax.devices())
    bucket = _row_bucket(true_batch, n_devices)
    if bucket != true_batch:
        frames = np.pad(frames, ((0, bucket - true_batch), (0, 0)))
        lengths = np.pad(lengths, (0, bucket - true_batch), constant_values=frames.shape[1])

    frames_dev = jnp.asarray(frames, dtype=jnp.float32)
    lengths_dev = jnp.asarray(lengths, dtype=jnp.int32)
    if n_devices > 1:
        frames_dev, lengths_dev = _shard_batch_rows([frames_dev, lengths_dev])

    out = dsp.handcrafted_features_batch(
        frames_dev,
        lengths_dev,
        sr=sample_rate,
        **_flag_kwargs(flags),
    )
    return np.asarray(out)[:true_batch]


def _row_bucket(true_rows: int, n_devices: int) -> int:
    """Pow2 row bucket, rounded up to a device-count multiple when sharding."""
    bucket = _next_pow2(true_rows)
    if n_devices > 1:
        bucket = max(bucket, n_devices)
        if bucket % n_devices:
            bucket = ((bucket // n_devices) + 1) * n_devices
    return bucket


def _shard_batch_rows(arrays):
    """Places 1-leading-axis device arrays over the mesh data axis."""
    import jax

    from ser_tpu.parallel.mesh import build_mesh
    from ser_tpu.parallel.sharding import batch_sharding

    mesh = build_mesh()
    return [
        jax.device_put(array, batch_sharding(mesh, array.ndim)) for array in arrays
    ]


def _clip_framed_features(
    audio: np.ndarray,
    starts: np.ndarray,
    lengths: np.ndarray,
    frame_length: int,
    sample_rate: int,
    flags: FeatureFlags,
) -> np.ndarray:
    """Device-framed feature batch: ships the RAW clip, gathers frames on TPU.

    The overlapping frame matrix is ~3× the clip's bytes (3 s frames, 1 s
    stride); ``dsp.handcrafted_features_clip`` rebuilds it on device from
    one clip transfer. Each chunk's window is REBASED to its own first
    frame, so a chunk ships only the ~chunk-span slice of audio (an
    absolute-offset buffer would re-ship the whole clip prefix per chunk —
    quasi-quadratic for hour-long files). The slice pads to the next power
    of two and rows to the usual batch bucket, so arbitrary durations reuse
    O(log n) compiled programs. ``SER_FAST_DEVICE_FRAMING=0`` restores the
    host-framed path (A/B lever; numerics are bit-identical).
    """
    import jax

    offset = int(starts.min())
    span = int(starts.max()) - offset + frame_length
    clip = np.zeros(_next_pow2(span), dtype=np.float32)
    window = audio[offset : offset + span]
    clip[: window.size] = window
    starts = starts - offset

    true_rows = starts.size
    n_devices = len(jax.devices())
    bucket = _row_bucket(true_rows, n_devices)
    if bucket != true_rows:
        # Padded rows gather from offset 0 with length frame_length; their
        # outputs are discarded below.
        starts = np.pad(starts, (0, bucket - true_rows))
        lengths = np.pad(lengths, (0, bucket - true_rows), constant_values=frame_length)

    clip_dev = jnp.asarray(clip, dtype=jnp.float32)
    starts_dev = jnp.asarray(starts, dtype=jnp.int32)
    lengths_dev = jnp.asarray(lengths, dtype=jnp.int32)
    if n_devices > 1:
        starts_dev, lengths_dev = _shard_batch_rows([starts_dev, lengths_dev])

    out = dsp.handcrafted_features_clip(
        clip_dev,
        starts_dev,
        lengths_dev,
        frame_length=frame_length,
        sr=sample_rate,
        **_flag_kwargs(flags),
    )
    return np.asarray(out)[:true_rows]


def _features_small(audio: np.ndarray, sample_rate: int, flags: FeatureFlags) -> np.ndarray:
    """Exact small-signal path for frames shorter than 2048 samples.

    librosa conventions for short inputs: stft-magnitude features (chroma,
    contrast) use n_fft=len with hop=n_fft//4; mel/MFCC keep hop=512; tonnetz
    keeps n_fft=2048 (the suppressed "n_fft too large" case, dsp.py:22-35).
    """
    prepared = pad_audio_for_fft(np.asarray(audio, dtype=np.float32))
    n_fft = min(prepared.size, _FULL_NFFT)
    length = prepared.size
    signal = jnp.asarray(prepared[None, :], dtype=jnp.float32)
    lengths = jnp.asarray([length], dtype=jnp.int32)

    def mask_for(mag_cols: int, hop: int) -> jnp.ndarray:
        return jnp.arange(mag_cols)[None, :] < (1 + lengths // hop)[:, None]

    def mean(values: jnp.ndarray, mask: jnp.ndarray) -> np.ndarray:
        return np.asarray(dsp._masked_mean_cols(values, mask))[0]

    parts: list[np.ndarray] = []
    mel_pow = mel_mask = None
    if flags.mfcc or flags.mel:
        mag_mel = dsp.stft_magnitude(signal, n_fft, _HOP)
        mel_mask = mask_for(mag_mel.shape[-1], _HOP)
        mel_pow = dsp.mel_power(mag_mel, sample_rate, n_fft)
    if flags.chroma or flags.contrast:
        hop = max(1, n_fft // 4)
        mag = dsp.stft_magnitude(signal, n_fft, hop)
        mask = mask_for(mag.shape[-1], hop)

    if flags.mfcc:
        parts.append(mean(dsp.mfcc_per_column(mel_pow, mel_mask), mel_mask))
    if flags.chroma:
        parts.append(mean(dsp.chroma_per_column(mag, mask, sample_rate, n_fft), mask))
    if flags.mel:
        parts.append(mean(mel_pow, mel_mask))
    if flags.contrast:
        s_db = dsp.power_to_db_ref_max(mag * mag, mask)
        parts.append(
            mean(dsp.spectral_contrast_per_column(s_db, mask, sample_rate, n_fft), mask)
        )
    if flags.tonnetz:
        mag_t = dsp.stft_magnitude(signal, _FULL_NFFT, _HOP)
        mask_t = mask_for(mag_t.shape[-1], _HOP)
        # col_mask keeps the HPSS time-median's boundary handling identical
        # to the batched/bucketed path (clamped at the true signal end).
        parts.append(
            mean(
                dsp.tonnetz_per_column(
                    mag_t, sample_rate, _FULL_NFFT, col_mask=mask_t
                ),
                mask_t,
            )
        )
    if not parts:
        return np.empty(0, dtype=np.float64)
    return np.concatenate(parts).astype(np.float64)


def extract_feature_from_signal(
    audio: np.ndarray,
    sample_rate: int,
    *,
    feature_flags: FeatureFlags | None = None,
) -> np.ndarray:
    """Whole-signal feature vector (reference dsp.py:67-151 equivalent).

    Returns a 1-D float64 vector in [mfcc, chroma, mel, contrast, tonnetz]
    order for the enabled flags.
    """
    flags = feature_flags if feature_flags is not None else FeatureFlags()
    _validate(np.asarray(audio), sample_rate)
    prepared = pad_audio_for_fft(np.asarray(audio, dtype=np.float32))
    if feature_dim(flags) == 0:
        return np.empty(0, dtype=np.float64)
    if prepared.size < _FULL_NFFT:
        return _features_small(prepared, sample_rate, flags)
    bucket_len = int(np.ceil(prepared.size / _LENGTH_BUCKET)) * _LENGTH_BUCKET
    frame = np.zeros((1, bucket_len), dtype=np.float32)
    frame[0, : prepared.size] = prepared
    features = _batched_features(
        frame, np.asarray([prepared.size], dtype=np.int32), sample_rate, flags
    )
    return features[0].astype(np.float64)


def extract_frame_features(
    audio: np.ndarray,
    sample_rate: int,
    *,
    frame_size_seconds: float = 3.0,
    frame_stride_seconds: float = 1.0,
    feature_flags: FeatureFlags | None = None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Frame-level features for one clip in a single batched TPU call.

    Returns ``(features, start_seconds, end_seconds)`` with features float32 of
    shape (n_frames, D). Framing matches reference handcrafted.py:78-97: frames
    start every stride, are truncated at clip end, and empty frames are
    skipped.
    """
    flags = feature_flags if feature_flags is not None else FeatureFlags()
    audio = np.asarray(audio, dtype=np.float32)
    _validate(audio, sample_rate)

    frame_length = max(1, int(round(frame_size_seconds * sample_rate)))
    frame_step = max(1, int(round(frame_stride_seconds * sample_rate)))

    starts = np.arange(0, audio.size, frame_step, dtype=np.int64)
    ends = np.minimum(starts + frame_length, audio.size)
    lengths = (ends - starts).astype(np.int64)
    keep = lengths > 0
    starts, ends, lengths = starts[keep], ends[keep], lengths[keep]
    if starts.size == 0:
        raise ValueError("Could not extract handcrafted features from provided audio.")

    dim = feature_dim(flags)
    features = np.zeros((starts.size, dim), dtype=np.float32)

    bulk = lengths >= _FULL_NFFT
    if np.any(bulk):
        bulk_idx = np.flatnonzero(bulk)
        # Bounded device batches: an unbounded batch scales HBM with clip
        # duration (an hour of 3 s frames is thousands of rows; the STFT
        # window gather alone would be tens of GB). Chunks re-use one
        # compiled program per (chunk_rows, frame_length) shape.
        device_framing = os.environ.get("SER_FAST_DEVICE_FRAMING", "1").strip() != "0"
        for chunk_start in range(0, bulk_idx.size, _MAX_DEVICE_ROWS):
            chunk = bulk_idx[chunk_start : chunk_start + _MAX_DEVICE_ROWS]
            if device_framing:
                features[chunk] = _clip_framed_features(
                    audio,
                    starts[chunk].astype(np.int32),
                    lengths[chunk].astype(np.int32),
                    frame_length,
                    sample_rate,
                    flags,
                )
                continue
            frames = np.zeros((chunk.size, frame_length), dtype=np.float32)
            for row, i in enumerate(chunk):
                frames[row, : lengths[i]] = audio[starts[i] : ends[i]]
            features[chunk] = _batched_features(
                frames, lengths[chunk].astype(np.int32), sample_rate, flags
            )
    for i in np.flatnonzero(~bulk):
        features[i] = _features_small(audio[starts[i] : ends[i]], sample_rate, flags).astype(
            np.float32
        )

    return (
        features,
        starts.astype(np.float64) / float(sample_rate),
        ends.astype(np.float64) / float(sample_rate),
    )


def extract_feature_vectors_batch(
    clips: list[tuple[np.ndarray, int]],
    *,
    feature_flags: FeatureFlags | None = None,
) -> np.ndarray:
    """Whole-clip feature vectors for many clips in few device calls.

    TPU-native replacement for the reference's per-file ``mp.Pool`` loop
    (reference ``ser/_internal/data/data_loader.py:374-380``): clips are
    grouped by (sample_rate, padded-length bucket) and each group runs as one
    batched jitted call; masks keep results exact per true length.

    Returns an (n_clips, D) float64 matrix in input order.
    """
    flags = feature_flags if feature_flags is not None else FeatureFlags()
    dim = feature_dim(flags)
    out = np.zeros((len(clips), dim), dtype=np.float64)

    groups: dict[tuple[int, int], list[tuple[int, np.ndarray]]] = {}
    for index, (audio, sr) in enumerate(clips):
        audio = np.asarray(audio, dtype=np.float32)
        _validate(audio, sr)
        prepared = pad_audio_for_fft(audio)
        if prepared.size < _FULL_NFFT:
            out[index] = _features_small(prepared, sr, flags)
            continue
        bucket = int(np.ceil(prepared.size / _LENGTH_BUCKET)) * _LENGTH_BUCKET
        # Keep the prepared array: re-converting/re-padding in the assembly
        # loop doubled the host-side copy cost over dataset-sized calls.
        groups.setdefault((sr, bucket), []).append((index, prepared))

    for (sr, bucket), members in groups.items():
        for chunk_start in range(0, len(members), _MAX_DEVICE_ROWS):
            chunk = members[chunk_start : chunk_start + _MAX_DEVICE_ROWS]
            frames = np.zeros((len(chunk), bucket), dtype=np.float32)
            lengths = np.zeros(len(chunk), dtype=np.int32)
            for row, (_, prepared) in enumerate(chunk):
                frames[row, : prepared.size] = prepared
                lengths[row] = prepared.size
            indices = np.asarray([index for index, _ in chunk])
            out[indices] = _batched_features(frames, lengths, sr, flags).astype(
                np.float64
            )
    return out


__all__ = [
    "extract_feature_from_signal",
    "extract_feature_vectors_batch",
    "extract_frame_features",
    "feature_dim",
    "pad_audio_for_fft",
]
