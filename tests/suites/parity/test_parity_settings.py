"""Differential parity: env → AppConfig resolution vs the reference.

Drives the same environment dict through this repo's
``capture_settings_inputs → build_settings_from_inputs`` and the reference's
``reload_settings`` (in the oracle subprocess), then compares every shared,
env-tunable knob. Documented divergences excluded from comparison:

- transcription ``backend_id`` (reference: stable/faster-whisper ids; TPU
  build: ``jax_whisper``) and whisper model names (per-catalog resolution),
- reader strictness (this rebuild raises on malformed values where the
  reference silently falls back to defaults — tested separately in the unit
  suite), and
- default folder roots when NO env overrides them (the reference defaults its
  dataset folder to the relative ``ser/dataset/ravdess``; this build uses the
  platform data root).
"""

from __future__ import annotations

import pytest

from ser_tpu._internal.config.settings_builder import build_settings_from_inputs
from ser_tpu._internal.config.settings_inputs import capture_settings_inputs

RUNTIME_KNOBS = (
    "timeout_seconds",
    "max_timeout_retries",
    "max_transient_retries",
    "retry_backoff_seconds",
    "pool_window_size_seconds",
    "pool_window_stride_seconds",
    "post_smoothing_window_frames",
    "post_hysteresis_enter_confidence",
    "post_hysteresis_exit_confidence",
    "post_min_segment_duration_seconds",
)


def _repo_settings(env: dict[str, str]):
    return build_settings_from_inputs(capture_settings_inputs(env=env))


def _runtime_dict(profile_runtime) -> dict:
    return {name: getattr(profile_runtime, name) for name in RUNTIME_KNOBS}


def test_default_knobs_match_reference(oracle):
    ref = oracle.call("resolve_settings", env={})
    repo = _repo_settings({})
    assert dict(repo.emotions) == ref["emotions"]
    assert repo.default_language == ref["default_language"]
    assert repo.dataset.strict_audit == ref["dataset_strict_audit"]
    assert {
        name: getattr(repo.data_loader, name) for name in ref["data_loader"]
    } == ref["data_loader"]
    assert {
        name: getattr(repo.training, name) for name in ref["training"]
    } == ref["training"]
    assert {name: getattr(repo.runtime_flags, name) for name in ref["flags"]} == ref[
        "flags"
    ]
    assert repo.models.model_file_name == ref["models"]["model_file_name"]
    assert repo.models.secure_model_file_name == ref["models"]["secure_model_file_name"]
    assert (
        repo.models.training_report_file_name
        == ref["models"]["training_report_file_name"]
    )
    assert repo.models.num_cores == ref["models"]["num_cores"]
    assert repo.medium_training.min_window_std == ref["medium_training"]["min_window_std"]
    assert (
        repo.medium_training.max_windows_per_clip
        == ref["medium_training"]["max_windows_per_clip"]
    )
    assert {
        name: getattr(repo.quality_gate, name) for name in ref["quality_gate"]
    } == ref["quality_gate"]
    assert repo.schema.output_schema_version == ref["schema"]["output_schema_version"]
    assert repo.schema.artifact_schema_version == ref["schema"]["artifact_schema_version"]
    assert repo.transcription.use_demucs == ref["transcription"]["use_demucs"]
    assert repo.transcription.use_vad == ref["transcription"]["use_vad"]


def test_default_profile_runtimes_match_reference(oracle):
    ref = oracle.call("resolve_settings", env={})
    repo = _repo_settings({})
    repo_runtimes = {
        "fast": _runtime_dict(repo.fast_runtime),
        "medium": _runtime_dict(repo.medium_runtime),
        "accurate": _runtime_dict(repo.accurate_runtime),
        "accurate-research": _runtime_dict(repo.accurate_research_runtime),
    }
    assert repo_runtimes == ref["runtimes"]


REFERENCE_CANONICAL_ENV = {
    "DATASET_FOLDER": "/data/speech/corpus",
    "DEFAULT_LANGUAGE": "de",
    "SER_STRICT_DATASET_AUDIT": "1",
    "SER_MAX_WORKERS": "3",
    "SER_MAX_FAILED_FILES": "7",
    "SER_MAX_FAILED_FILE_RATIO": "0.125",
    "SER_MAX_FAILURES_PER_REASON": "4",
    "SER_MIN_REMAINING_PER_CLASS_SPLIT": "2",
    "SER_STRICT_QUARANTINE": "true",
    "SER_TEST_SIZE": "0.3",
    "SER_DEV_SIZE": "0.15",
    "SER_RANDOM_STATE": "1234",
    "SER_ENABLE_PROFILE_PIPELINE": "1",
    "SER_ENABLE_MEDIUM_PROFILE": "1",
    "SER_ENABLE_ACCURATE_PROFILE": "1",
    "SER_ENABLE_NEW_OUTPUT_SCHEMA": "1",
    "SER_MODEL_FILE_NAME": "custom_model.pkl",
    "SER_SECURE_MODEL_FILE_NAME": "custom_model.skops",
    "SER_TRAINING_REPORT_FILE_NAME": "custom_report.json",
    "SER_OUTPUT_SCHEMA_VERSION": "v2",
    "SER_MEDIUM_MIN_WINDOW_STD": "0.25",
    "SER_MEDIUM_MAX_WINDOWS_PER_CLIP": "12",
    "SER_QUALITY_GATE_MIN_UAR_DELTA": "0.01",
    "SER_QUALITY_GATE_MIN_MACRO_F1_DELTA": "0.02",
    "SER_QUALITY_GATE_MAX_MEDIUM_SEGMENTS_PER_MINUTE": "18.5",
    "SER_QUALITY_GATE_MIN_MEDIUM_MEDIAN_SEGMENT_DURATION_SECONDS": "1.75",
    "WHISPER_DEMUCS": "1",
    "WHISPER_VAD": "0",
    "SER_FAST_TIMEOUT_SECONDS": "42.5",
    "SER_MEDIUM_POOL_WINDOW_SIZE_SECONDS": "3.5",
}


def test_reference_canonical_env_names_resolve_identically(oracle):
    """A reference deployment's environment configures this build identically."""
    ref = oracle.call("resolve_settings", env=dict(REFERENCE_CANONICAL_ENV))
    repo = _repo_settings(dict(REFERENCE_CANONICAL_ENV))
    assert str(repo.dataset.folder) == ref["dataset_folder"]
    assert repo.default_language == ref["default_language"] == "de"
    assert repo.dataset.strict_audit is True
    assert {
        name: getattr(repo.data_loader, name) for name in ref["data_loader"]
    } == ref["data_loader"]
    assert {
        name: getattr(repo.training, name) for name in ref["training"]
    } == ref["training"]
    assert {name: getattr(repo.runtime_flags, name) for name in ref["flags"]} == ref[
        "flags"
    ]
    assert repo.models.model_file_name == "custom_model.pkl"
    assert repo.models.secure_model_file_name == ref["models"]["secure_model_file_name"]
    assert (
        repo.models.training_report_file_name
        == ref["models"]["training_report_file_name"]
    )
    assert repo.schema.output_schema_version == ref["schema"]["output_schema_version"]
    assert repo.medium_training.min_window_std == ref["medium_training"]["min_window_std"]
    assert (
        repo.medium_training.max_windows_per_clip
        == ref["medium_training"]["max_windows_per_clip"]
    )
    assert {
        name: getattr(repo.quality_gate, name) for name in ref["quality_gate"]
    } == ref["quality_gate"]
    assert repo.transcription.use_demucs is ref["transcription"]["use_demucs"] is True
    assert repo.transcription.use_vad is ref["transcription"]["use_vad"] is False
    assert (
        repo.fast_runtime.timeout_seconds
        == ref["runtimes"]["fast"]["timeout_seconds"]
        == 42.5
    )
    assert (
        repo.medium_runtime.pool_window_size_seconds
        == ref["runtimes"]["medium"]["pool_window_size_seconds"]
        == 3.5
    )


def test_per_axis_failure_ratios_follow_global_ratio(oracle):
    env = {"SER_MAX_FAILED_FILE_RATIO": "0.2"}
    ref = oracle.call("resolve_settings", env=env)
    repo = _repo_settings(env)
    assert (
        repo.data_loader.max_failed_file_ratio_per_corpus
        == ref["data_loader"]["max_failed_file_ratio_per_corpus"]
        == 0.2
    )
    assert (
        repo.data_loader.max_failed_file_ratio_per_class
        == ref["data_loader"]["max_failed_file_ratio_per_class"]
        == 0.2
    )
    # ...unless independently pinned.
    env2 = {
        "SER_MAX_FAILED_FILE_RATIO": "0.2",
        "SER_MAX_FAILED_FILE_RATIO_PER_CLASS": "0.05",
    }
    ref2 = oracle.call("resolve_settings", env=env2)
    repo2 = _repo_settings(env2)
    assert (
        repo2.data_loader.max_failed_file_ratio_per_class
        == ref2["data_loader"]["max_failed_file_ratio_per_class"]
        == 0.05
    )


def test_recipe_implies_strict_audit(oracle):
    env = {"SER_DATASET_RECIPE": "research-v1"}
    ref = oracle.call("resolve_settings", env=env)
    repo = _repo_settings(env)
    assert repo.dataset.recipe == ref["dataset_recipe"] == "research-v1"
    assert repo.dataset.strict_audit is ref["dataset_strict_audit"] is True
    # Explicit opt-out wins over the implication.
    env2 = {"SER_DATASET_RECIPE": "research-v1", "SER_STRICT_DATASET_AUDIT": "0"}
    ref2 = oracle.call("resolve_settings", env=env2)
    repo2 = _repo_settings(env2)
    assert repo2.dataset.strict_audit is ref2["dataset_strict_audit"] is False


def test_root_rehoming_matches_reference(oracle):
    env = {"SER_CACHE_DIR": "/fast/cache", "SER_DATA_DIR": "/fast/data"}
    ref = oracle.call("resolve_settings", env=env)
    repo = _repo_settings(env)
    assert str(repo.tmp_folder) == ref["tmp_folder"] == "/fast/cache/tmp"
    assert (
        str(repo.models.model_cache_dir)
        == ref["models"]["model_cache_dir"]
        == "/fast/cache/model-cache"
    )
    assert str(repo.models.folder) == ref["models"]["folder"] == "/fast/data/models"
    assert (
        str(repo.timeline.folder)
        == ref["transcripts_folder"]
        == "/fast/data/transcripts"
    )
    # A specific override beats the re-homed root on both sides.
    env2 = {**env, "SER_MODELS_DIR": "/elsewhere/models"}
    ref2 = oracle.call("resolve_settings", env=env2)
    repo2 = _repo_settings(env2)
    assert str(repo2.models.folder) == ref2["models"]["folder"] == "/elsewhere/models"


def test_manifest_paths_split_on_commas(oracle):
    env = {"SER_DATASET_MANIFESTS": "/a/one.jsonl, /b/two.jsonl"}
    ref = oracle.call("resolve_settings", env=env)
    repo = _repo_settings(env)
    assert [str(p) for p in repo.dataset.manifest_paths] == ref["manifest_paths"] == [
        "/a/one.jsonl",
        "/b/two.jsonl",
    ]


@pytest.mark.parametrize(
    "env",
    [
        {"SER_TMP_DIR": "/scratch/tmp"},
        {"SER_TRANSCRIPTS_DIR": "/out/transcripts"},
        {"SER_MODELS_DIR": "/out/models"},
    ],
    ids=["tmp", "transcripts", "models"],
)
def test_reference_dir_aliases_resolve_to_same_paths(oracle, env):
    ref = oracle.call("resolve_settings", env=env)
    repo = _repo_settings(env)
    if "SER_TMP_DIR" in env:
        assert str(repo.tmp_folder) == ref["tmp_folder"] == "/scratch/tmp"
    if "SER_TRANSCRIPTS_DIR" in env:
        assert str(repo.timeline.folder) == ref["transcripts_folder"]
    if "SER_MODELS_DIR" in env:
        assert str(repo.models.folder) == ref["models"]["folder"]
