"""Differential parity: profile precedence, catalog knob values, artifact names.

Reference stages: ``ser/profiles.py:686-693`` (flag precedence),
``ser/profile_defs.yaml`` knob values via the validated catalog, and
``ser/_internal/config/artifact_naming.py:28-68`` (sha1-suffixed filenames).

Documented intentional deltas (TPU-first redesign, not drift):
- ``process_isolation`` defaults to False here (no torch/MPS worker crashes to
  contain; see ``ser_tpu/_internal/runtime/worker_lifecycle.py``),
- transcription ``backend_id`` is ``jax_whisper`` for every profile (one JAX
  encoder-decoder replaces stable/faster-whisper),
- medium/accurate emotion backend ids are ``jax_xlsr``/``jax_whisper_encoder``.
Everything else must match the reference value for value.
"""

from __future__ import annotations

from itertools import product

from hypothesis import given, settings
from hypothesis import strategies as st

from ser_tpu._internal.config.artifact_naming import (
    artifact_model_id_suffix,
    artifact_profile_from_runtime_flags,
    profile_artifact_file_names,
)
from ser_tpu.profiles import get_profile_catalog, resolve_profile_name

FLAG_COMBOS = list(product((False, True), repeat=3))

RUNTIME_KNOBS_PARITY = (
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


def test_profile_precedence_parity(oracle):
    """All 8 flag combinations resolve identically (ref profiles.py:686-693)."""
    for medium, accurate, accurate_research in FLAG_COMBOS:
        flags = {
            "medium_profile": medium,
            "accurate_profile": accurate,
            "accurate_research_profile": accurate_research,
        }
        assert resolve_profile_name(**flags) == oracle.call("resolve_profile", flags=flags)


def test_catalog_knob_values_parity(oracle):
    """Every runtime/transcription/model knob value matches the reference catalog."""
    reference = oracle.call("catalog_snapshot")
    repo = get_profile_catalog()
    assert set(repo) == set(reference)
    for name, entry in repo.items():
        ref_entry = reference[name]
        for knob in RUNTIME_KNOBS_PARITY:
            assert getattr(entry.runtime_defaults, knob) == ref_entry["runtime_defaults"][knob], (
                name,
                knob,
            )
        assert entry.model.default_model_id == ref_entry["model"]["default_model_id"], name
        assert entry.enabled_by_default == ref_entry["enabled_by_default"], name
        ref_tx = ref_entry["transcription_defaults"]
        assert entry.transcription_defaults.model_name == ref_tx["model_name"], name
        assert entry.transcription_defaults.use_demucs == ref_tx["use_demucs"], name
        assert entry.transcription_defaults.use_vad == ref_tx["use_vad"], name
        # Documented deltas hold their exact documented values — no silent drift.
        assert ref_entry["runtime_defaults"]["process_isolation"] == (name != "fast")
        assert entry.runtime_defaults.process_isolation is False
        assert entry.transcription_defaults.backend_id == "jax_whisper"
    # Emotion backend ids: fast and accurate-research are shared names.
    assert repo["fast"].backend_id == reference["fast"]["backend_id"] == "handcrafted"
    assert (
        repo["accurate-research"].backend_id
        == reference["accurate-research"]["backend_id"]
        == "emotion2vec"
    )


def test_artifact_profile_from_flags_parity(oracle):
    for medium, accurate, accurate_research in FLAG_COMBOS:
        flags = {
            "medium_profile": medium,
            "accurate_profile": accurate,
            "accurate_research_profile": accurate_research,
        }
        reference = oracle.call(
            "artifact_names",
            model_id="any",
            profile="fast",
            medium_model_id="m",
            accurate_model_id="a",
            accurate_research_model_id="r",
            flags=flags,
        )
        assert artifact_profile_from_runtime_flags(**flags) == reference["profile_from_flags"]


@settings(max_examples=150, deadline=None)
@given(
    model_id=st.text(min_size=0, max_size=80),
    profile=st.sampled_from(["fast", "medium", "accurate", "accurate-research"]),
)
def test_artifact_names_parity(oracle, model_id, profile):
    """sha1 suffixing and per-profile filenames match on arbitrary model ids."""
    reference = oracle.call(
        "artifact_names",
        model_id=model_id,
        profile=profile,
        medium_model_id=model_id,
        accurate_model_id=model_id,
        accurate_research_model_id=model_id,
        flags={
            "medium_profile": False,
            "accurate_profile": False,
            "accurate_research_profile": False,
        },
    )
    assert artifact_model_id_suffix(model_id) == reference["suffix"]
    repo_names = profile_artifact_file_names(
        profile=profile,
        medium_model_id=model_id,
        accurate_model_id=model_id,
        accurate_research_model_id=model_id,
    )
    assert list(repo_names) == reference["names"]


def test_runtime_profile_surface_parity(oracle):
    """available_profiles()/resolve_profile() match the reference's public
    shape (reference profiles.py:44-53,681-698). Descriptions deliberately
    deviate: they describe this stack (the reference's fast description says
    "CPU-first"), so only presence is asserted."""
    from ser_tpu.profiles import available_profiles

    ours = available_profiles()
    theirs = oracle.call("available_profiles")
    assert set(ours) == set(theirs)
    for name, profile in ours.items():
        assert profile.name == name
        assert profile.description  # non-empty; wording is ours
