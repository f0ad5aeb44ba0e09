"""Shared machinery for transformer encoder backends: chunking + batching.

Parity surface: reference ``ser/_internal/repr/hf_xlsr.py`` (30 s max chunks at
``:92,185-227``, even per-chunk timestamp interpolation, non-finite → float32
retry at ``:262-300``). TPU-first difference: the reference encodes chunks
*sequentially* through torch; here all chunks of a clip form ONE batched
fixed-shape jitted call (chunk lengths bucketed, padded frames masked out of
attention), so long audio parallelizes instead of serializing (SURVEY §2.10
item 6).
"""

from __future__ import annotations

from collections.abc import Callable
from pathlib import Path

import numpy as np

from ser_tpu._internal.pool.device_pool import device_pooling_enabled
from ser_tpu._internal.repr.backend import EncodedSequence
from ser_tpu._internal.utils.audio_io import resample_audio
from ser_tpu._internal.utils.jax_runtime import ensure_compilation_cache
from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

ENCODER_SAMPLE_RATE = 16000
MAX_CHUNK_SECONDS = 30.0
#: Chunk-length buckets (seconds) to bound jit recompilation.
_CHUNK_BUCKETS_SECONDS = (1, 2, 4, 8, 15, 30)

ensure_compilation_cache()


def _gather_valid_finite(raw, valid_idx: np.ndarray):
    """One jitted program: valid-frame gather + f32 cast + finite reduction.

    Returns ``(gathered (T, D) f32 on device, finite scalar)``. Fused so the
    SER_DEVICE_POOLING lane pays one dispatch and one scalar sync instead of
    three round trips.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fused(raw, idx):
        flat = raw.reshape(-1, raw.shape[-1])
        gathered = jnp.take(flat, idx, axis=0).astype(jnp.float32)
        return gathered, jnp.isfinite(gathered).all()

    return fused(raw, jnp.asarray(valid_idx))


def random_init_seed(backend_id: str, model_id: str) -> int:
    """Deterministic per-(backend, model) seed for random-init test mode.

    A shared seed made the medium and accurate-research eval rows
    bit-identical whenever both fell back to the same tiny config (identical
    params → identical embeddings → duplicate evidence). Salting with the
    identity keeps runs reproducible while giving every backend/model pair
    independent weights.
    """
    import hashlib

    digest = hashlib.sha256(f"{backend_id}:{model_id}".encode("utf-8")).digest()
    return int.from_bytes(digest[:4], "big")


def resolve_local_model_dir(cache_root: Path, model_id: str) -> Path | None:
    """Finds a local weights dir for one model id (no network).

    Accepts HF-format dirs (``config.json``) and FunASR/ModelScope dirs
    (``model.pt``, the layout of the emotion2vec family).
    """
    cache_root = Path(cache_root)
    candidates = [
        cache_root / model_id,
        cache_root / model_id.replace("/", "--"),
        cache_root / "hub" / f"models--{model_id.replace('/', '--')}",
    ]

    def has_weights(path: Path) -> bool:
        return (path / "config.json").exists() or (path / "model.pt").exists()

    def snapshot_order(snapshots: Path) -> list[Path]:
        # Prefer the hash refs/main points at (the HF cache's notion of the
        # current revision); otherwise newest mtime. Lexicographic hash
        # order is unrelated to recency and can pick a superseded snapshot.
        ref = snapshots.parent / "refs" / "main"
        if ref.is_file():
            pointed = snapshots / ref.read_text(encoding="utf-8").strip()
            if pointed.is_dir():
                return [pointed]
        return sorted(
            snapshots.iterdir(), key=lambda p: p.stat().st_mtime, reverse=True
        )

    for candidate in candidates:
        if has_weights(candidate):
            return candidate
        snapshots = candidate / "snapshots"
        if snapshots.is_dir():
            for snap in snapshot_order(snapshots):
                if has_weights(snap):
                    return snap
    return None


def plan_chunks(n_samples: int, sample_rate: int = ENCODER_SAMPLE_RATE):
    """Splits a clip into <=30 s chunks; returns [(start, length), ...]."""
    max_len = int(MAX_CHUNK_SECONDS * sample_rate)
    starts = list(range(0, n_samples, max_len))
    return [(s, min(max_len, n_samples - s)) for s in starts if n_samples - s > 0]


def bucket_samples(length: int, sample_rate: int = ENCODER_SAMPLE_RATE) -> int:
    """Smallest bucket (in samples) holding ``length``."""
    for seconds in _CHUNK_BUCKETS_SECONDS:
        if length <= seconds * sample_rate:
            return int(seconds * sample_rate)
    return int(_CHUNK_BUCKETS_SECONDS[-1] * sample_rate)


def shard_chunk_batch(batch: np.ndarray, lengths: np.ndarray):
    """Lays a clip's chunk batch out over the mesh data axis (GSPMD).

    This IS the long-audio sequence-axis sharding (SURVEY §5): a long clip's
    time axis is split into 30 s segments, and those segments — the batch
    dimension here — are placed across chips with a NamedSharding so one
    jitted encode runs segment-parallel over ICI. Rows are padded to a
    multiple of the data-axis size (full-length silent chunks, dropped by
    the caller via the true row count).

    Returns ``(batch, lengths, true_rows)``; single-device environments pass
    through untouched.
    """
    import jax

    true_rows = batch.shape[0]
    if len(jax.devices()) <= 1:
        return batch, lengths, true_rows
    # A CPU-pinned attempt (jax.default_device(cpu) — the boundary's CPU
    # fallback) must NOT be committed back onto the accelerator mesh.
    default = jax.config.jax_default_device
    if default is not None and getattr(default, "platform", None) == "cpu":
        return batch, lengths, true_rows
    from ser_tpu.parallel.mesh import DATA_AXIS, build_mesh
    from ser_tpu.parallel.sharding import batch_sharding

    mesh = build_mesh()
    n_data = mesh.shape[DATA_AXIS]
    remainder = true_rows % n_data
    if remainder:
        pad_rows = n_data - remainder
        batch = np.concatenate(
            [batch, np.zeros((pad_rows, batch.shape[1]), dtype=batch.dtype)]
        )
        # Padded rows are silent full-length chunks: harmless to encode,
        # excluded from reassembly by true_rows.
        lengths = np.concatenate(
            [lengths, np.full(pad_rows, batch.shape[1], dtype=lengths.dtype)]
        )
    batch = jax.device_put(batch, batch_sharding(mesh, 2))
    lengths = jax.device_put(lengths, batch_sharding(mesh, 1))
    return batch, lengths, true_rows


def _valid_frames_finite(embeddings, lengths, frames_for_length) -> bool:
    """Finiteness over VALID frames only: padded frame positions are
    contractually arbitrary (a masked softmax row may be NaN) and must not
    trigger the float32 retry or fail the batch."""
    return all(
        bool(np.all(np.isfinite(embeddings[row, : max(1, frames_for_length(int(n)))])))
        for row, n in enumerate(lengths)
    )


def chunked_encode(
    audio: np.ndarray,
    sample_rate: int,
    *,
    encode_batch: Callable[[np.ndarray, np.ndarray], np.ndarray],
    frames_for_length: Callable[[int], int],
    backend_id: str,
    float32_encode_batch: Callable[[], Callable[[np.ndarray, np.ndarray], np.ndarray]]
    | None = None,
) -> EncodedSequence:
    """Runs one clip through the batched chunk encoder with exact timestamps.

    ``encode_batch(chunks (B, L), lengths (B,)) -> (B, F_max, D)`` embeddings
    (padded frames arbitrary); ``frames_for_length(samples) -> n_valid``.
    Timestamps are evenly interpolated across each chunk's true duration
    (reference hf_xlsr.py:185-227 semantics). ``float32_encode_batch``, when
    given, supplies a genuinely-float32 encode path for the non-finite retry
    (reference hf_xlsr.py:262-300 resets the runtime to float32; re-running
    the same bf16 computation would be a no-op).
    """
    if audio.ndim != 1 or audio.size == 0:
        raise ValueError("audio must be non-empty mono.")
    audio16k = resample_audio(np.asarray(audio, dtype=np.float32), sample_rate, ENCODER_SAMPLE_RATE)
    # Tail chunks shorter than the conv receptive field yield zero frames;
    # emitting a fully-masked garbage row instead would poison clip-end
    # features. Their audio tail is < one frame (~25 ms) — drop them.
    chunks = [c for c in plan_chunks(audio16k.size) if frames_for_length(c[1]) > 0]
    if not chunks:
        raise ValueError(
            f"Clip ({audio16k.size} samples) is shorter than the {backend_id} "
            "encoder receptive field."
        )
    bucket = max(bucket_samples(length) for _, length in chunks)

    batch = np.zeros((len(chunks), bucket), dtype=np.float32)
    lengths = np.zeros(len(chunks), dtype=np.int32)
    for row, (start, length) in enumerate(chunks):
        batch[row, :length] = audio16k[start : start + length]
        lengths[row] = length

    sharded_batch, sharded_lengths, true_rows = shard_chunk_batch(batch, lengths)

    n_valids = [max(1, frames_for_length(length)) for _, length in chunks]
    starts_s, ends_s = [], []
    for (start, length), n_valid in zip(chunks, n_valids):
        chunk_start = start / ENCODER_SAMPLE_RATE
        frame_duration = (length / ENCODER_SAMPLE_RATE) / n_valid
        frame_starts = chunk_start + frame_duration * np.arange(n_valid)
        starts_s.append(frame_starts)
        ends_s.append(frame_starts + frame_duration)

    device_embeddings = None
    embeddings_batch = None
    if device_pooling_enabled():
        # SER_DEVICE_POOLING lane: keep the frame matrix ON DEVICE — the
        # accurate serving path is fetch-bound (INFER_ACCURATE_r04: 15.4 MB
        # of frames at tunnel bandwidth dwarfs the 50 ms encode), and
        # mean_std_pool pools device-resident embeddings in place, fetching
        # only (n_windows, 2*dim). The finite gate reduces on device and
        # fetches one scalar; a non-finite result falls back to the host
        # float32 retry path below (rare, and exactness matters more there).
        raw = encode_batch(sharded_batch, sharded_lengths)[:true_rows]
        f_max = int(raw.shape[1])
        valid_idx = np.concatenate(
            [row * f_max + np.arange(n_valid) for row, n_valid in enumerate(n_valids)]
        )
        # ONE fused dispatch for gather + finite reduction: every extra
        # device round trip costs ~70 ms over the tunnel — two separate
        # dispatches plus a standalone isfinite sync erased the lane's win
        # in the first A/B measurement.
        gathered, finite = _gather_valid_finite(raw, valid_idx)
        if bool(finite):
            device_embeddings = gathered
        else:
            logger.warning(
                "Non-finite embeddings from %s; retrying in float32.", backend_id
            )
            retry_encode = (
                float32_encode_batch()
                if float32_encode_batch is not None
                else encode_batch
            )
            embeddings_batch = np.asarray(retry_encode(batch, lengths))
            if not _valid_frames_finite(embeddings_batch, lengths, frames_for_length):
                raise ValueError(
                    f"Backend {backend_id} produced non-finite embeddings."
                )
    else:
        embeddings_batch = np.asarray(encode_batch(sharded_batch, sharded_lengths))[
            :true_rows
        ]
        if not _valid_frames_finite(embeddings_batch, lengths, frames_for_length):
            # Reference behavior: retry in float32 after a non-finite result.
            logger.warning(
                "Non-finite embeddings from %s; retrying in float32.", backend_id
            )
            retry_encode = (
                float32_encode_batch()
                if float32_encode_batch is not None
                else encode_batch
            )
            embeddings_batch = np.asarray(retry_encode(batch, lengths))
            if not _valid_frames_finite(embeddings_batch, lengths, frames_for_length):
                raise ValueError(
                    f"Backend {backend_id} produced non-finite embeddings."
                )

    if device_embeddings is not None:
        embeddings = device_embeddings
    else:
        embeddings = np.concatenate(
            [
                embeddings_batch[row, :n_valid]
                for row, n_valid in enumerate(n_valids)
            ]
        ).astype(np.float32)

    return EncodedSequence(
        embeddings=embeddings,
        frame_start_seconds=np.concatenate(starts_s).astype(np.float64),
        frame_end_seconds=np.concatenate(ends_s).astype(np.float64),
        backend_id=backend_id,
    )


def chunked_encode_many(
    clips: list[tuple[np.ndarray, int]],
    *,
    encode_batch: Callable[[np.ndarray, np.ndarray], np.ndarray],
    frames_for_length: Callable[[int], int],
    backend_id: str,
    max_batch_chunks: int = 32,
    attention_score_budget: float = 5e7,
    float32_encode_batch: Callable[[], Callable[[np.ndarray, np.ndarray], np.ndarray]]
    | None = None,
) -> list[EncodedSequence]:
    """Encodes MANY clips with chunks pooled into large cross-clip batches.

    The training-path replacement for per-utterance sequential encoding
    (reference ``medium_feature_dataset.py:48-113`` iterates per utterance):
    all clips' chunks are flattened, grouped BY LENGTH BUCKET (padding every
    1 s chunk to a 30 s outlier's bucket would blow attention cost ~900x and
    shrink the batch cap by the same factor), and fed through the encoder in
    fixed-shape device batches — rows padded up to each bucket's cap so the
    number of compiled shapes is bounded by the bucket count, not by the
    mix of clip lengths. Per-bucket non-finite results retry through
    ``float32_encode_batch`` (reference hf_xlsr.py:262-300), matching
    :func:`chunked_encode`.
    """
    # Flatten chunk work items: (clip_index, start_sample, length)
    resampled: list[np.ndarray] = []
    work: list[tuple[int, int, int]] = []
    for clip_index, (audio, sr) in enumerate(clips):
        if audio.ndim != 1 or audio.size == 0:
            raise ValueError("Every clip must be non-empty mono audio.")
        audio16k = resample_audio(
            np.asarray(audio, dtype=np.float32), sr, ENCODER_SAMPLE_RATE
        )
        resampled.append(audio16k)
        clip_work = [
            (clip_index, start, length)
            for start, length in plan_chunks(audio16k.size)
            if frames_for_length(length) > 0
        ]
        if not clip_work:
            raise ValueError(
                f"Clip {clip_index} ({audio16k.size} samples) is shorter than "
                f"the {backend_id} encoder receptive field."
            )
        work.extend(clip_work)

    # Group by bucket shape; encode each group in row-padded batches.
    by_bucket: dict[int, list[int]] = {}
    for item_index, (_, _, length) in enumerate(work):
        by_bucket.setdefault(bucket_samples(length), []).append(item_index)

    chunk_embeddings: dict[int, np.ndarray] = {}
    for bucket in sorted(by_bucket):
        item_indices = by_bucket[bucket]
        # Bound B so B * F^2 attention scores stay within budget (tiny test
        # configs have very short conv strides → huge frame counts/chunk).
        frames_per_chunk = max(1, frames_for_length(bucket))
        batch_cap = max(
            1,
            min(max_batch_chunks, int(attention_score_budget // (frames_per_chunk**2))),
        )
        for batch_start in range(0, len(item_indices), batch_cap):
            batch_items = item_indices[batch_start : batch_start + batch_cap]
            # Fixed row count per (bucket, cap): pad with silent rows and
            # slice the true ones — a remainder batch must not compile a
            # fresh shape (minutes per shape over a remote-compile link).
            batch = np.zeros((batch_cap, bucket), dtype=np.float32)
            lengths = np.zeros(batch_cap, dtype=np.int32)
            for row, item_index in enumerate(batch_items):
                clip_index, start, length = work[item_index]
                batch[row, :length] = resampled[clip_index][start : start + length]
                lengths[row] = length
            # Padding rows reuse the last real row's length so
            # frames_for_length stays positive for every row.
            lengths[len(batch_items) :] = lengths[max(0, len(batch_items) - 1)]
            sharded_batch, sharded_lengths, true_rows = shard_chunk_batch(batch, lengths)
            out = np.asarray(encode_batch(sharded_batch, sharded_lengths))[:true_rows]
            real_lengths = lengths[: len(batch_items)]
            if not _valid_frames_finite(out, real_lengths, frames_for_length):
                logger.warning(
                    "Non-finite embeddings from %s; retrying batch in float32.",
                    backend_id,
                )
                retry_encode = (
                    float32_encode_batch()
                    if float32_encode_batch is not None
                    else encode_batch
                )
                out = np.asarray(retry_encode(batch, lengths))
                if not _valid_frames_finite(out, real_lengths, frames_for_length):
                    raise ValueError(
                        f"Backend {backend_id} produced non-finite embeddings."
                    )
            for row, item_index in enumerate(batch_items):
                chunk_embeddings[item_index] = out[row]

    # Reassemble per clip with even per-chunk timestamp interpolation.
    sequences: list[EncodedSequence] = []
    work_index = 0
    for clip_index, audio16k in enumerate(resampled):
        embeddings, starts_s, ends_s = [], [], []
        for start, length in plan_chunks(audio16k.size):
            if frames_for_length(length) <= 0:
                continue
            n_valid = frames_for_length(length)
            valid = chunk_embeddings[work_index][:n_valid]
            work_index += 1
            chunk_start = start / ENCODER_SAMPLE_RATE
            frame_duration = (length / ENCODER_SAMPLE_RATE) / n_valid
            frame_starts = chunk_start + frame_duration * np.arange(n_valid)
            embeddings.append(valid)
            starts_s.append(frame_starts)
            ends_s.append(frame_starts + frame_duration)
        stacked = np.concatenate(embeddings).astype(np.float32)
        if not np.all(np.isfinite(stacked)):
            raise ValueError(f"Backend {backend_id} produced non-finite embeddings.")
        sequences.append(
            EncodedSequence(
                embeddings=stacked,
                frame_start_seconds=np.concatenate(starts_s).astype(np.float64),
                frame_end_seconds=np.concatenate(ends_s).astype(np.float64),
                backend_id=backend_id,
            )
        )
    return sequences


__all__ = [
    "ENCODER_SAMPLE_RATE",
    "MAX_CHUNK_SECONDS",
    "bucket_samples",
    "chunked_encode",
    "chunked_encode_many",
    "plan_chunks",
    "resolve_local_model_dir",
    "shard_chunk_batch",
]
