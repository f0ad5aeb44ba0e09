"""Cross-clip chunk batching (`chunked_encode_many`): shapes, retry, errors.

A fake deterministic encoder stands in for the device call so the batching
policy itself is pinned: per-bucket grouping (a 1 s chunk must not pad to a
30 s outlier's bucket), fixed row counts per bucket (remainder batches must
not compile fresh shapes), numerical equality with the per-clip path, the
float32 retry, and per-clip short-audio errors.
"""

import numpy as np
import pytest

from ser_tpu._internal.repr.encoder_backend import (
    ENCODER_SAMPLE_RATE,
    bucket_samples,
    chunked_encode,
    chunked_encode_many,
)

DIM = 4


def _frames_for_length(length: int) -> int:
    return int(length) // 320


def _fake_encode_batch(chunks, lengths):
    """Deterministic per-sample 'embedding': mean/std-style reductions so the
    result depends only on each row's VALID samples, not on padding."""
    chunks = np.asarray(chunks)
    lengths = np.asarray(lengths)
    out = np.zeros((chunks.shape[0], _frames_for_length(chunks.shape[1]) or 1, DIM))
    for row in range(chunks.shape[0]):
        n = max(1, _frames_for_length(int(lengths[row])))
        for frame in range(min(n, out.shape[1])):
            seg = chunks[row, frame * 320 : (frame + 1) * 320]
            out[row, frame] = [seg.sum(), np.abs(seg).sum(), seg.max(initial=0.0), 1.0]
    return out


def _clip(seconds, seed=0):
    rng = np.random.default_rng(seed)
    return (0.3 * rng.standard_normal(int(seconds * ENCODER_SAMPLE_RATE))).astype(
        np.float32
    )


def test_many_matches_per_clip_path():
    clips = [(_clip(1.0, 1), ENCODER_SAMPLE_RATE), (_clip(2.5, 2), ENCODER_SAMPLE_RATE)]
    many = chunked_encode_many(
        clips,
        encode_batch=_fake_encode_batch,
        frames_for_length=_frames_for_length,
        backend_id="fake",
    )
    for (audio, sr), seq in zip(clips, many):
        single = chunked_encode(
            audio,
            sr,
            encode_batch=_fake_encode_batch,
            frames_for_length=_frames_for_length,
            backend_id="fake",
        )
        np.testing.assert_allclose(seq.embeddings, single.embeddings, rtol=1e-6)
        np.testing.assert_allclose(seq.frame_start_seconds, single.frame_start_seconds)


def test_buckets_are_grouped_not_globalized():
    """A short clip's chunks must ride their own bucket, not the outlier's."""
    seen_shapes = []

    def recording_encode(chunks, lengths):
        seen_shapes.append(np.asarray(chunks).shape)
        return _fake_encode_batch(chunks, lengths)

    clips = [
        (_clip(1.0, 3), ENCODER_SAMPLE_RATE),
        (_clip(1.1, 4), ENCODER_SAMPLE_RATE),
        (_clip(29.9, 5), ENCODER_SAMPLE_RATE),
    ]
    chunked_encode_many(
        clips,
        encode_batch=recording_encode,
        frames_for_length=_frames_for_length,
        backend_id="fake",
    )
    widths = {shape[1] for shape in seen_shapes}
    assert len(widths) >= 2, f"expected per-bucket widths, saw {seen_shapes}"
    small = bucket_samples(int(1.1 * ENCODER_SAMPLE_RATE))
    assert small in widths  # the 1 s clips kept their small bucket


def test_remainder_batches_reuse_the_full_row_count():
    """5 same-bucket chunks with cap 4 → two calls, both with 4 rows (the
    remainder is row-padded, not a fresh compile shape)."""
    seen_rows = []

    def recording_encode(chunks, lengths):
        seen_rows.append(np.asarray(chunks).shape[0])
        return _fake_encode_batch(chunks, lengths)

    clips = [(_clip(1.0, 10 + i), ENCODER_SAMPLE_RATE) for i in range(5)]
    chunked_encode_many(
        clips,
        encode_batch=recording_encode,
        frames_for_length=_frames_for_length,
        backend_id="fake",
        max_batch_chunks=4,
    )
    assert len(seen_rows) == 2
    assert seen_rows[0] == seen_rows[1]


def test_short_clip_error_names_the_clip():
    clips = [
        (_clip(1.0, 20), ENCODER_SAMPLE_RATE),
        (np.zeros(100, np.float32), ENCODER_SAMPLE_RATE),  # < receptive field
    ]
    with pytest.raises(ValueError, match="Clip 1 .*receptive field"):
        chunked_encode_many(
            clips,
            encode_batch=_fake_encode_batch,
            frames_for_length=_frames_for_length,
            backend_id="fake",
        )


def test_float32_retry_recovers_nonfinite_batches():
    calls = {"n": 0}

    def flaky_encode(chunks, lengths):
        calls["n"] += 1
        out = _fake_encode_batch(chunks, lengths)
        out[:] = np.nan  # bf16-style blowup on VALID frames
        return out

    retried = {"n": 0}

    def float32_encode_batch():
        retried["n"] += 1
        return _fake_encode_batch

    clips = [(_clip(1.0, 30), ENCODER_SAMPLE_RATE)]
    sequences = chunked_encode_many(
        clips,
        encode_batch=flaky_encode,
        frames_for_length=_frames_for_length,
        backend_id="fake",
        float32_encode_batch=float32_encode_batch,
    )
    assert retried["n"] == 1
    assert np.all(np.isfinite(sequences[0].embeddings))


def test_padded_frame_nans_do_not_trigger_retry():
    """Padded frame positions are contractually arbitrary."""

    def encode_with_nan_padding(chunks, lengths):
        out = _fake_encode_batch(chunks, lengths)
        for row in range(out.shape[0]):
            n = max(1, _frames_for_length(int(np.asarray(lengths)[row])))
            out[row, n:] = np.nan
        return out

    def must_not_retry():
        raise AssertionError("float32 retry must not fire for padded NaNs")

    clips = [
        (_clip(0.7, 40), ENCODER_SAMPLE_RATE),
        (_clip(1.0, 41), ENCODER_SAMPLE_RATE),
    ]
    sequences = chunked_encode_many(
        clips,
        encode_batch=encode_with_nan_padding,
        frames_for_length=_frames_for_length,
        backend_id="fake",
        float32_encode_batch=must_not_retry,
    )
    assert all(np.all(np.isfinite(s.embeddings)) for s in sequences)
