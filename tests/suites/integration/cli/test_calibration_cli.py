"""--calibrate-transcription-runtime through main() with a stubbed backend."""

import json
from pathlib import Path

import numpy as np
import pytest

from ser_tpu.__main__ import main
from ser_tpu._internal.utils.audio_io import write_wav
from ser_tpu.domain import TranscriptWord


@pytest.fixture
def ravdess_env(tmp_path, monkeypatch):
    ds = tmp_path / "ds" / "Actor_01"
    ds.mkdir(parents=True)
    tone = (0.3 * np.sin(2 * np.pi * 220 * np.arange(16000) / 16000)).astype(np.float32)
    # Statement field 5: 01 → 'kids...', 02 → 'dogs...'
    write_wav(ds / "03-01-01-01-01-01-01.wav", tone, 16000)
    write_wav(ds / "03-01-03-01-02-01-01.wav", tone, 16000)
    monkeypatch.setenv("SER_DATASET_FOLDER", str(tmp_path / "ds"))
    monkeypatch.setenv("SER_TMP_FOLDER", str(tmp_path / "tmp"))
    monkeypatch.setenv("SER_MODELS_FOLDER", str(tmp_path / "models"))
    return tmp_path


class PerfectTranscriber:
    def __init__(self, **kwargs):
        self._sentences = {
            "01": "kids are talking by the door",
            "02": "dogs are sitting by the door",
        }

    def transcribe(self, file_path, *, language="en"):
        statement = Path(file_path).name.split("-")[4]
        words = self._sentences.get(statement, "").split()
        return [TranscriptWord(w, 0.1 * i, 0.1 * i + 0.1) for i, w in enumerate(words)]


def test_calibration_persists_recommendation(ravdess_env, monkeypatch, capsys):
    import ser_tpu.__main__ as cli

    monkeypatch.setattr(
        "ser_tpu._internal.transcript.jax_whisper_backend.JaxWhisperTranscriber",
        PerfectTranscriber,
    )
    code = main(["--calibrate-transcription-runtime"])
    assert code == 0
    out = capsys.readouterr().out
    assert "Recommended:" in out and "WER 0.00" in out

    report = json.loads(
        (ravdess_env / "tmp" / "transcription_calibration.json").read_text()
    )
    rec = report["recommendation"]
    assert rec["mean_wer"] == 0.0
    assert rec["backend_id"] == "jax_whisper"
    assert rec["confidence"] in ("high", "medium")
    assert report["candidates"][0]["samples"] == 2


def test_calibration_without_assets_is_a_validation_error(ravdess_env, capsys):
    # Real transcriber, no staged Whisper weights → typed validation exit.
    code = main(["--calibrate-transcription-runtime"])
    assert code == 2
