"""Runtime pipeline through injected fakes (reference test strategy, SURVEY §4)."""

import dataclasses

import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs
from ser_tpu._internal.runtime.pipeline import RuntimePipeline
from ser_tpu.domain import TranscriptWord
from ser_tpu.runtime.contracts import InferenceRequest
from ser_tpu.runtime.schema import FramePrediction, InferenceResult, SegmentPrediction


def _settings(tmp_path, **env):
    base = {
        "SER_MODELS_FOLDER": str(tmp_path / "models"),
        "SER_TRANSCRIPTS_FOLDER": str(tmp_path / "transcripts"),
    }
    base.update(env)
    return build_settings_from_inputs(capture_settings_inputs(env=base))


def _fake_result():
    frame = FramePrediction(0.0, 1.0, "happy", 0.9, None)
    segment = SegmentPrediction("happy", 0.0, 1.0, 0.9)
    return InferenceResult(schema_version="v1", segments=[segment], frames=[frame])


def _pipeline(settings, *, hooks=None, transcript_fn=None):
    return RuntimePipeline(
        settings=settings,
        backend_hooks=hooks if hooks is not None else {"handcrafted": lambda req: _fake_result()},
        transcript_fn=transcript_fn
        if transcript_fn is not None
        else (lambda *a: [TranscriptWord("hi", 0.0, 0.5)]),
        print_timeline_fn=lambda timeline: None,
    )


def test_pipeline_happy_path(tmp_path):
    settings = _settings(tmp_path)
    execution = _pipeline(settings).run_inference(
        InferenceRequest(file_path="x.wav", language="en")
    )
    assert execution.profile == "fast"
    assert execution.backend_id == "handcrafted"
    assert [segment.emotion for segment in execution.emotions] == ["happy"]
    assert [word.word for word in execution.transcript] == ["hi"]
    assert execution.timeline  # merged rows exist
    assert execution.used_backend_path
    # Phase timings cover the canonical phases that ran.
    for phase in ("workflow_total", "emotion_setup", "emotion_inference", "transcription",
                  "timeline_build", "timeline_output"):
        assert phase in execution.phase_timings_seconds


def test_pipeline_skips_transcription_when_excluded(tmp_path):
    settings = _settings(tmp_path)
    calls = []

    def transcript_fn(*args):
        calls.append(args)
        return []

    execution = _pipeline(settings, transcript_fn=transcript_fn).run_inference(
        InferenceRequest(file_path="x.wav", language="en", include_transcript=False)
    )
    assert calls == []
    assert execution.transcript == []
    assert "transcription" not in execution.phase_timings_seconds


def test_pipeline_saves_outputs(tmp_path):
    settings = _settings(tmp_path)
    execution = _pipeline(settings).run_inference(
        InferenceRequest(
            file_path="clip.wav",
            language="en",
            save_transcript=True,
            subtitle_output_path=str(tmp_path / "out.srt"),
        )
    )
    assert execution.timeline_csv_path and execution.timeline_csv_path.endswith("clip.csv")
    assert execution.subtitle_path == str(tmp_path / "out.srt")
    assert (tmp_path / "out.srt").exists()


def test_pipeline_profile_selection_follows_flags(tmp_path):
    settings = _settings(tmp_path, SER_ENABLE_MEDIUM_PROFILE="1")
    seen = []

    def medium_hook(request):
        seen.append(request.file_path)
        return _fake_result()

    pipeline = _pipeline(
        settings, hooks={"jax_xlsr": medium_hook, "handcrafted": lambda r: _fake_result()}
    )
    execution = pipeline.run_inference(
        InferenceRequest(file_path="y.wav", language="en", include_transcript=False)
    )
    assert execution.profile == "medium"
    assert execution.backend_id == "jax_xlsr"
    assert seen == ["y.wav"]


def test_pipeline_unavailable_profile_raises(tmp_path):
    from ser_tpu._internal.runtime.registry import UnsupportedProfileError

    settings = _settings(tmp_path, SER_ENABLE_ACCURATE_PROFILE="1")
    pipeline = _pipeline(settings, hooks={"handcrafted": lambda r: _fake_result()})
    with pytest.raises(UnsupportedProfileError):
        pipeline.run_inference(
            InferenceRequest(file_path="x.wav", language="en", include_transcript=False)
        )


def test_pipeline_applies_environment_plan_for_workflow_scope(tmp_path):
    """The env plan is live during hooks and restored afterwards (reference
    pipeline.py:164-167 + environment_plan.py:72-101)."""
    import os

    settings = _settings(tmp_path)
    observed = {}

    def capturing_hook(request):
        observed["HF_HOME"] = os.environ.get("HF_HOME")
        observed["HF_HUB_OFFLINE"] = os.environ.get("HF_HUB_OFFLINE")
        return _fake_result()

    before = os.environ.get("HF_HOME")
    _pipeline(settings, hooks={"handcrafted": capturing_hook}).run_inference(
        InferenceRequest(file_path="x.wav", language="en", include_transcript=False)
    )
    assert observed["HF_HOME"] == str(settings.models.huggingface_cache_root)
    assert observed["HF_HUB_OFFLINE"] == "1"
    assert os.environ.get("HF_HOME") == before  # restored after the workflow


def test_pipeline_passes_timings_dict_to_transcript_fn(tmp_path):
    """Transcript sub-phases recorded by the fn surface in the execution."""
    settings = _settings(tmp_path)

    def transcript_fn(file_path, language, profile, settings, timings):
        timings["transcription_setup"] = 0.01
        timings["transcription_model_load"] = 0.02
        return [TranscriptWord("hey", 0.0, 0.4)]

    execution = _pipeline(settings, transcript_fn=transcript_fn).run_inference(
        InferenceRequest(file_path="x.wav", language="en")
    )
    assert execution.phase_timings_seconds["transcription_setup"] == 0.01
    assert execution.phase_timings_seconds["transcription_model_load"] == 0.02
    assert "transcription" in execution.phase_timings_seconds


def test_pipeline_training_dispatch(tmp_path):
    settings = _settings(tmp_path)
    trained = []
    pipeline = dataclasses.replace(
        _pipeline(settings), train_fns={"fast": lambda s: trained.append(s)}
    )
    pipeline.run_training()
    assert trained == [settings]


def test_soft_timeout_returns_within_budget():
    """The in-process timeout must BOUND caller latency — the old `with`
    executor joined the hung thread, blocking for the full hang."""
    import time

    import pytest

    from ser_tpu._internal.runtime.errors import InferenceTimeoutError
    from ser_tpu._internal.runtime.worker_lifecycle import run_attempt_in_process

    def setup():
        return None

    def compute(_ctx):
        time.sleep(3.0)
        return "late"

    start = time.perf_counter()
    with pytest.raises(InferenceTimeoutError):
        run_attempt_in_process(
            setup=setup, compute=compute, timeout_seconds=0.2, profile="fast"
        )
    elapsed = time.perf_counter() - start
    assert elapsed < 1.5, f"timeout did not bound latency: {elapsed:.1f}s"


def test_isolated_profile_payload_is_picklable():
    """process_isolation spawns a worker that unpickles (setup, compute);
    the old closure payload failed pickling, breaking isolation entirely."""
    import pickle
    from functools import partial

    from ser_tpu._internal.runtime.profile_boundary import (
        _spawned_compute,
        _spawned_setup,
    )

    payload = pickle.dumps(
        (partial(_spawned_setup, "medium", "/tmp/clip.wav"), _spawned_compute)
    )
    setup, compute = pickle.loads(payload)
    assert setup.args == ("medium", "/tmp/clip.wav")
    assert compute is _spawned_compute
