"""Audio IO tests for the in-house WAV decoder."""

import numpy as np
import pytest

from ser_tpu._internal.config.schema import AudioReadConfig
from ser_tpu._internal.utils.audio_io import (
    AudioDecodeError,
    AudioIntegrityError,
    read_audio_file,
    resample_audio,
    write_wav,
)

FAST_RETRY = AudioReadConfig(max_retries=1, retry_delay_seconds=0.0)


def _write_tone(path, sr=16000, seconds=0.5, freq=440.0):
    t = np.arange(int(sr * seconds)) / sr
    audio = 0.5 * np.sin(2 * np.pi * freq * t).astype(np.float32)
    write_wav(path, audio, sr)
    return audio


def test_wav_round_trip(tmp_path):
    path = tmp_path / "tone.wav"
    original = _write_tone(path)
    audio, sr = read_audio_file(str(path), audio_read_config=FAST_RETRY)
    assert sr == 16000
    assert audio.shape == original.shape
    assert audio.dtype == np.float32
    # Peak-normalized to [-1, 1].
    assert np.max(np.abs(audio)) == pytest.approx(1.0, abs=1e-4)
    # Waveform shape preserved up to scaling.
    corr = np.corrcoef(audio, original)[0, 1]
    assert corr > 0.999


def test_segment_read(tmp_path):
    path = tmp_path / "tone.wav"
    _write_tone(path, seconds=1.0)
    audio, sr = read_audio_file(
        str(path), start_seconds=0.25, duration_seconds=0.5, audio_read_config=FAST_RETRY
    )
    assert audio.size == int(0.5 * sr)


def test_lfs_pointer_detection(tmp_path):
    path = tmp_path / "pointer.wav"
    path.write_bytes(b"version https://git-lfs.github.com/spec/v1\noid sha256:abc\n")
    with pytest.raises(AudioIntegrityError):
        read_audio_file(str(path), audio_read_config=FAST_RETRY)


def test_missing_file():
    with pytest.raises(FileNotFoundError):
        read_audio_file("/nonexistent/file.wav", audio_read_config=FAST_RETRY)


def test_garbage_bytes_raise_decode_error(tmp_path):
    path = tmp_path / "garbage.wav"
    path.write_bytes(b"this is not audio at all, just text bytes")
    with pytest.raises(AudioDecodeError):
        read_audio_file(str(path), audio_read_config=FAST_RETRY)


def test_stereo_mixdown(tmp_path):
    # Hand-build a stereo 16-bit WAV: L = tone, R = silence → mono = tone/2 pre-normalize.
    import struct

    sr = 8000
    left = (0.5 * np.sin(2 * np.pi * 200 * np.arange(800) / sr) * 32767).astype("<i2")
    right = np.zeros(800, dtype="<i2")
    interleaved = np.empty(1600, dtype="<i2")
    interleaved[0::2] = left
    interleaved[1::2] = right
    payload = interleaved.tobytes()
    header = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 2, sr, sr * 4, 4, 16)
    data = b"data" + struct.pack("<I", len(payload)) + payload
    path = tmp_path / "stereo.wav"
    path.write_bytes(header + fmt + data)
    audio, rate = read_audio_file(str(path), audio_read_config=FAST_RETRY)
    assert rate == sr
    assert audio.ndim == 1
    assert audio.size == 800


def test_float32_wav(tmp_path):
    import struct

    sr = 8000
    samples = (0.25 * np.sin(2 * np.pi * 100 * np.arange(400) / sr)).astype("<f4")
    payload = samples.tobytes()
    header = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
    data = b"data" + struct.pack("<I", len(payload)) + payload
    path = tmp_path / "float.wav"
    path.write_bytes(header + fmt + data)
    audio, rate = read_audio_file(str(path), audio_read_config=FAST_RETRY)
    assert rate == sr and audio.size == 400


def test_resample_halves_length():
    audio = np.sin(2 * np.pi * 100 * np.arange(3200) / 32000).astype(np.float32)
    out = resample_audio(audio, 32000, 16000)
    assert out.size == 1600
    assert out.dtype == np.float32


def test_nan_scrub(tmp_path):
    import struct

    sr = 8000
    samples = np.full(100, np.nan, dtype="<f4")
    samples[50] = 0.5
    payload = samples.tobytes()
    header = b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, sr, sr * 4, 4, 32)
    path = tmp_path / "nan.wav"
    path.write_bytes(header + fmt + b"data" + struct.pack("<I", len(payload)) + payload)
    audio, _ = read_audio_file(str(path), audio_read_config=FAST_RETRY)
    assert np.all(np.isfinite(audio))
    assert audio[50] == pytest.approx(1.0)  # peak-normalized survivor


def test_truncated_16bit_payload_trims_to_whole_samples(tmp_path):
    """An interrupted copy that cuts the data chunk mid-sample decodes the
    whole samples instead of failing the read (matching the 24-bit path and
    the native decoder)."""
    import numpy as np

    from ser_tpu._internal.utils.audio_io import read_audio_file, write_wav

    path = tmp_path / "ok.wav"
    write_wav(path, np.linspace(-0.5, 0.5, 1000, dtype=np.float32), 16000)
    data = path.read_bytes()
    (tmp_path / "cut.wav").write_bytes(data[:-3])  # ragged 16-bit tail
    audio, sr = read_audio_file(str(tmp_path / "cut.wav"))
    assert sr == 16000
    assert audio.size in (998, 999)


def test_write_wav_rejects_multichannel():
    import numpy as np
    import pytest

    from ser_tpu._internal.utils.audio_io import write_wav

    with pytest.raises(ValueError, match="mono"):
        write_wav("/tmp/never.wav", np.zeros((100, 2), dtype=np.float32), 16000)
