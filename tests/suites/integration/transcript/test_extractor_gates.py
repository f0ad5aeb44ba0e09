"""Extractor orchestration gates: compat, HBM admission, phases, isolation."""

import dataclasses
import json
import time

import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.transcript import extractor as extractor_mod
from ser_tpu._internal.transcript.base import CompatibilityIssue, CompatibilityReport
from ser_tpu._internal.transcript.extractor import (
    TranscriptionUnavailableError,
    extract_transcript,
)
from ser_tpu.domain import TranscriptWord


def _settings(tmp_path, **env):
    base = {"SER_MODELS_FOLDER": str(tmp_path / "models")}
    base.update(env)
    return build_settings_from_inputs(capture_settings_inputs(env=base))


class StubTranscriber:
    """Adapter double recording the orchestration order."""

    def __init__(self, *, blocking=False):
        self.calls = []
        self._blocking = blocking
        self._loaded = False

    backend_id = "jax_whisper"

    def check_compatibility(self):
        self.calls.append("check_compatibility")
        issues = (
            (CompatibilityIssue(kind="functional", message="assets gone", blocking=True),)
            if self._blocking
            else ()
        )
        return CompatibilityReport(issues=issues)

    def setup_required(self):
        return not self._loaded

    def prepare_assets(self):
        self.calls.append("prepare_assets")

    def load_model(self, request=None):
        self.calls.append("load_model")
        self._loaded = True

    def transcribe(self, file_path, *, language="en"):
        self.calls.append("transcribe")
        return [TranscriptWord("stubbed", 0.0, 0.5)]


@pytest.fixture
def stubbed(monkeypatch):
    stub = StubTranscriber()
    monkeypatch.setattr(
        extractor_mod, "_build_transcriber", lambda resolved, settings: stub
    )
    return stub


def test_extractor_emits_setup_and_model_load_phases(tmp_path, stubbed):
    settings = _settings(tmp_path)
    timings = {}
    words = extract_transcript(
        "clip.wav", language="en", profile="fast", settings=settings, timings=timings
    )
    assert [w.word for w in words] == ["stubbed"]
    assert "transcription_setup" in timings
    assert "transcription_model_load" in timings
    assert stubbed.calls == ["check_compatibility", "load_model", "transcribe"]


def test_extractor_blocks_on_blocking_compatibility_issue(tmp_path, monkeypatch):
    stub = StubTranscriber(blocking=True)
    monkeypatch.setattr(
        extractor_mod, "_build_transcriber", lambda resolved, settings: stub
    )
    with pytest.raises(TranscriptionUnavailableError, match="assets gone"):
        extract_transcript(
            "clip.wav", language="en", profile="fast", settings=_settings(tmp_path)
        )
    assert "load_model" not in stub.calls


def test_admission_denial_blocks_model_load(tmp_path, stubbed, monkeypatch):
    from ser_tpu._internal.transcript import hbm_admission

    monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 64.0)
    settings = _settings(tmp_path)
    with pytest.raises(TranscriptionUnavailableError, match="admission"):
        extract_transcript(
            "clip.wav", language="en", profile="fast", settings=settings
        )
    assert "load_model" not in stubbed.calls


def test_calibration_report_overrides_admission_denial(tmp_path, stubbed, monkeypatch):
    """A fresh report waives the headroom+safety MARGINS — free memory must
    still cover the bare footprint (calibration ran without the emotion
    encoder resident; overriding the live check would OOM)."""
    from ser_tpu._internal.transcript import hbm_admission

    # distil-large-v3 footprint is 3780 MB; defaults add 512 MB of margins.
    # 3900 MB free: denied without a report, admitted with one.
    monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 3900.0)
    settings = _settings(tmp_path)
    model_name = settings.models.whisper_model.name or "distil-large-v3"
    report_path = tmp_path / "calibration.json"
    report_path.write_text(
        json.dumps(
            {
                "recommendation": {
                    "backend_id": "jax_whisper",
                    "model_name": model_name,
                    "confidence": "high",
                    "mean_wer": 0.08,
                    "p50_latency_seconds": 0.4,
                    "generated_at_unix": time.time(),
                }
            }
        )
    )
    settings = dataclasses.replace(
        settings,
        transcription=dataclasses.replace(
            settings.transcription, calibration_report_path=report_path
        ),
    )
    words = extract_transcript(
        "clip.wav", language="en", profile="fast", settings=settings
    )
    assert [w.word for w in words] == ["stubbed"]
    assert "load_model" in stubbed.calls


def test_admission_disabled_always_admits(tmp_path, stubbed, monkeypatch):
    from ser_tpu._internal.transcript import hbm_admission

    monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 1.0)
    settings = _settings(tmp_path)
    settings = dataclasses.replace(
        settings,
        transcription=dataclasses.replace(
            settings.transcription, hbm_admission_control_enabled=False
        ),
    )
    assert extract_transcript(
        "clip.wav", language="en", profile="fast", settings=settings
    )


def test_isolation_routing_is_config_driven(tmp_path):
    from ser_tpu._internal.transcript.process_isolation import (
        should_use_process_isolated_path,
    )

    settings = _settings(tmp_path)
    assert not should_use_process_isolated_path("jax_whisper", settings=settings)
    isolated = dataclasses.replace(
        settings,
        transcription=dataclasses.replace(
            settings.transcription, process_isolation=True
        ),
    )
    # Tests force CPU, so the opt-in is honored here.
    assert should_use_process_isolated_path("jax_whisper", settings=isolated)


def test_calibration_override_never_bypasses_live_memory_check(tmp_path, monkeypatch):
    import time as _time

    from ser_tpu._internal.transcript import hbm_admission

    monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 64.0)
    settings = _settings(tmp_path)
    report_path = tmp_path / "calibration.json"
    report_path.write_text(
        json.dumps(
            {
                "recommendation": {
                    "backend_id": "jax_whisper",
                    "model_name": "distil-large-v3",
                    "confidence": "high",
                    "mean_wer": 0.08,
                    "p50_latency_seconds": 0.4,
                    "generated_at_unix": _time.time(),
                }
            }
        )
    )
    config = dataclasses.replace(
        settings.transcription, calibration_report_path=report_path
    )
    decision = hbm_admission.admit_transcription_model(
        "distil-large-v3", config=config
    )
    assert decision.admitted is False  # 64 MB cannot hold a 3.7 GB model


def test_corrupt_calibration_report_reads_as_no_override(tmp_path):
    from ser_tpu._internal.transcript import hbm_admission

    settings = _settings(tmp_path)
    report_path = tmp_path / "calibration.json"
    report_path.write_text(
        json.dumps(
            {
                "recommendation": {
                    "backend_id": "jax_whisper",
                    "model_name": "distil-large-v3",
                    "confidence": "HIGH",  # invalid casing must not KeyError
                    "mean_wer": 0.08,
                    "p50_latency_seconds": 0.4,
                    "generated_at_unix": "yesterday",  # non-numeric
                }
            }
        )
    )
    config = dataclasses.replace(
        settings.transcription, calibration_report_path=report_path
    )
    assert (
        hbm_admission.calibration_admission_override("distil-large-v3", config)
        is None
    )


def test_admission_consults_default_calibration_path(tmp_path, monkeypatch):
    """The report the calibration CLI writes at its default location is
    honored without configuring calibration_report_path explicitly."""
    import time as _time

    from ser_tpu._internal.transcript import hbm_admission
    from ser_tpu._internal.transcript.profiling import default_calibration_report_path

    monkeypatch.setattr(hbm_admission, "device_free_memory_mb", lambda: 3900.0)
    settings = _settings(tmp_path)
    report_path = default_calibration_report_path(settings.tmp_folder)
    report_path.parent.mkdir(parents=True, exist_ok=True)
    report_path.write_text(
        json.dumps(
            {
                "recommendation": {
                    "backend_id": "jax_whisper",
                    "model_name": "distil-large-v3",
                    "confidence": "high",
                    "mean_wer": 0.08,
                    "p50_latency_seconds": 0.4,
                    "generated_at_unix": _time.time(),
                }
            }
        )
    )
    decision = hbm_admission.admit_transcription_model(
        "distil-large-v3",
        config=settings.transcription,
        default_report_path=report_path,
    )
    assert decision.admitted is True
    assert "calibration report" in decision.reason


def test_each_profile_resolves_its_catalog_whisper_model(tmp_path):
    """Without WHISPER_MODEL, every profile transcribes with ITS catalog
    model — a truthy fast default in WhisperModelConfig previously pinned
    all profiles to distil-large-v3."""
    from ser_tpu._internal.transcript.extractor import resolve_transcription_profile

    settings = _settings(tmp_path)
    assert resolve_transcription_profile("fast", settings).model_name == "distil-large-v3"
    assert resolve_transcription_profile("medium", settings).model_name == "turbo"
    assert resolve_transcription_profile("accurate", settings).model_name == "large"
    # Explicit env selection still wins everywhere.
    chosen = _settings(tmp_path, WHISPER_MODEL="tiny")
    assert resolve_transcription_profile("accurate", chosen).model_name == "tiny"


def test_isolated_worker_payload_carries_resolved_profile(tmp_path):
    """The spawn payload ships the PARENT's resolved profile fields (env
    re-derivation in the child lost profile-projected flags)."""
    import dataclasses as _dc
    import pickle
    from functools import partial

    from ser_tpu._internal.transcript.extractor import (
        TranscriptionProfile,
        _isolated_setup,
        _isolated_transcribe,
    )

    resolved = TranscriptionProfile(
        backend_id="jax_whisper",
        model_name="large",
        use_demucs=True,
        use_vad=False,
        decode_strategy="beam",
        beam_size=3,
    )
    payload = pickle.dumps(
        (
            partial(_isolated_setup, _dc.asdict(resolved)),
            partial(_isolated_transcribe, "clip.wav", "en"),
        )
    )
    setup, transcribe = pickle.loads(payload)
    assert setup.args[0]["use_demucs"] is True
    assert setup.args[0]["decode_strategy"] == "beam"
