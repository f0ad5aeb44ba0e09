"""Data-parallel feature extraction over the 8-device virtual mesh."""

import jax
import numpy as np

from ser_tpu._internal.config.schema import FeatureFlags
from ser_tpu.ops.features import extract_feature_vectors_batch


def test_feature_batch_shards_across_devices_and_stays_exact():
    assert len(jax.devices()) == 8
    rng = np.random.default_rng(0)
    sr = 16000
    clips = [
        ((0.4 * np.sin(2 * np.pi * (200 + 40 * i) * np.arange(sr) / sr)).astype(np.float32), sr)
        for i in range(5)  # 5 clips → padded to 8 (device count) internally
    ]
    flags = FeatureFlags(tonnetz=False)
    batch = extract_feature_vectors_batch(clips, feature_flags=flags)
    assert batch.shape == (5, 187)
    assert np.all(np.isfinite(batch))
    # Per-clip extraction must agree with the sharded batch result.
    from ser_tpu.ops.features import extract_feature_from_signal

    single = extract_feature_from_signal(clips[2][0], sr, feature_flags=flags)
    np.testing.assert_allclose(batch[2], single, rtol=2e-4, atol=2e-4)


def test_bulk_frames_actually_shard_over_the_data_axis(monkeypatch):
    """The arrays entering the framed DSP program must carry NamedShardings
    over the mesh data axis (VERDICT: inspect .sharding). Default path:
    device framing — the per-frame starts/lengths shard over the data axis
    while the raw clip is replicated for the gather."""
    import numpy as np

    from ser_tpu.ops import features as features_mod
    from ser_tpu.ops import dsp as dsp_mod

    captured = {}
    original = dsp_mod.handcrafted_features_clip

    def capturing(clip, starts, lengths, **kwargs):
        captured["starts_sharding"] = starts.sharding
        captured["lengths_sharding"] = lengths.sharding
        return original(clip, starts, lengths, **kwargs)

    monkeypatch.setattr(dsp_mod, "handcrafted_features_clip", capturing)

    sr = 16000
    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal(sr * 9)).astype(np.float32)  # 8+ frames
    features_mod.extract_frame_features(audio, sr)

    import jax.sharding as shd

    starts_sharding = captured["starts_sharding"]
    assert isinstance(starts_sharding, shd.NamedSharding)
    assert starts_sharding.spec[0] is not None  # batch dim is sharded
    assert len(starts_sharding.mesh.devices.flatten()) == 8
    assert captured["lengths_sharding"].spec == starts_sharding.spec


def test_bulk_frames_shard_over_the_data_axis_host_framed(monkeypatch):
    """SER_FAST_DEVICE_FRAMING=0 path: the host-assembled frame matrix itself
    must enter the batch program sharded over the data axis."""
    import numpy as np

    from ser_tpu.ops import features as features_mod
    from ser_tpu.ops import dsp as dsp_mod

    monkeypatch.setenv("SER_FAST_DEVICE_FRAMING", "0")
    captured = {}
    original = dsp_mod.handcrafted_features_batch

    def capturing(frames, lengths, **kwargs):
        captured["frames_sharding"] = frames.sharding
        captured["lengths_sharding"] = lengths.sharding
        return original(frames, lengths, **kwargs)

    monkeypatch.setattr(dsp_mod, "handcrafted_features_batch", capturing)

    sr = 16000
    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal(sr * 9)).astype(np.float32)
    features_mod.extract_frame_features(audio, sr)

    import jax.sharding as shd

    frames_sharding = captured["frames_sharding"]
    assert isinstance(frames_sharding, shd.NamedSharding)
    assert frames_sharding.spec[0] is not None  # batch dim is sharded
    assert len(frames_sharding.mesh.devices.flatten()) == 8


def test_long_audio_chunks_shard_over_data_axis_and_stay_exact():
    """A 70 s clip's 30 s segments (its sequence axis) spread across the mesh
    and the reassembled EncodedSequence equals an unsharded reference."""
    import numpy as np

    from ser_tpu._internal.repr import encoder_backend as eb

    captured = {}

    def encode_batch(batch, lengths):
        captured["sharding"] = getattr(batch, "sharding", None)
        batch_np = np.asarray(batch)
        lengths_np = np.asarray(lengths)
        frames = batch_np.shape[1] // 16000
        out = np.zeros((batch_np.shape[0], frames, 4), dtype=np.float32)
        for row in range(batch_np.shape[0]):
            for frame in range(frames):
                seg = batch_np[row, frame * 16000 : (frame + 1) * 16000]
                out[row, frame] = [seg.mean(), seg.std(), seg.max(), float(lengths_np[row])]
        return out

    rng = np.random.default_rng(0)
    audio = (0.2 * rng.standard_normal(16000 * 70)).astype(np.float32)  # 3 chunks
    encoded = eb.chunked_encode(
        audio,
        16000,
        encode_batch=encode_batch,
        frames_for_length=lambda n: max(1, n // 16000),
        backend_id="test",
    )
    import jax.sharding as shd

    assert isinstance(captured["sharding"], shd.NamedSharding)
    assert captured["sharding"].spec[0] is not None

    # Single-device equivalence: bypass sharding entirely.
    batch, lengths, _ = (
        np.zeros((3, 30 * 16000), dtype=np.float32),
        np.asarray([480000, 480000, 160000], dtype=np.int32),
        3,
    )
    for row, (start, length) in enumerate(eb.plan_chunks(audio.size)):
        batch[row, :length] = audio[start : start + length]
    reference = encode_batch(batch, lengths)
    valid = np.concatenate([reference[0][:30], reference[1][:30], reference[2][:10]])
    np.testing.assert_allclose(encoded.embeddings, valid, rtol=1e-6)
    assert encoded.frame_start_seconds[0] == 0.0
    import pytest

    assert encoded.frame_end_seconds[-1] == pytest.approx(70.0)


def test_shard_chunk_batch_bypasses_mesh_under_cpu_scope():
    """The CPU-fallback device scope must not be defeated by the chunk
    sharding path committing inputs back onto the mesh."""
    import jax
    import numpy as np

    from ser_tpu._internal.repr.encoder_backend import shard_chunk_batch

    batch = np.zeros((3, 160), dtype=np.float32)
    lengths = np.full(3, 160, dtype=np.int32)

    sharded, _, _ = shard_chunk_batch(batch, lengths)
    assert not isinstance(sharded, np.ndarray)  # 8 devices: mesh placement

    with jax.default_device(jax.devices("cpu")[0]):
        passthrough, _, rows = shard_chunk_batch(batch, lengths)
    assert isinstance(passthrough, np.ndarray)  # untouched host array
    assert rows == 3
