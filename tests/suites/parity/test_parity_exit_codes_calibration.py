"""Differential parity: CLI exit-code classification + calibration subsets.

Reference stages:
- ``ser/_internal/runtime/commands.py:43-139`` — ``classify_training_exception``
  / ``classify_inference_exception``: the exception→exit-code contract the CLI
  promises scripts (2 = user-actionable, 3 = transcription failure, 1 = other).
- ``ser/_internal/transcription/ravdess_references.py:20-140`` — canonical
  sentence lookup, RAVDESS metadata parsing, and the seeded stratified
  (actor, statement) subset used by transcription calibration.

Every case runs the SAME symbolic input through this repo's classifier /
selector and through the reference implementation in the oracle subprocess,
asserting identical outputs.
"""

from __future__ import annotations

from pathlib import Path

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from ser_tpu._internal.models.training_orchestration import (
    QuarantineBudgetExceeded,
    TrainingNotReadyError,
)
from ser_tpu._internal.models.training_readiness import PreparedPlanError
from ser_tpu._internal.runtime.commands import classify_exit_code
from ser_tpu._internal.runtime.errors import (
    InferenceExecutionError,
    InferenceTimeoutError,
    ModelLoadError,
    ModelUnavailableError,
    RuntimeDependencyError,
)
from ser_tpu._internal.runtime.registry import UnsupportedProfileError
from ser_tpu._internal.runtime.restricted_backends import RestrictedBackendError
from ser_tpu._internal.transcript.calibration import (
    collect_reference_samples,
    ravdess_reference_text,
    stratified_reference_subset,
    summarize_subset_coverage,
)
from ser_tpu._internal.transcript.extractor import TranscriptionError

# Reference exception kind → this repo's equivalent exception instance. The
# reference carries one error taxonomy PER profile boundary
# (Fast/Medium/Accurate*Error); this repo unifies them — so every profile
# variant of a failure must classify to the same exit code as our single type.
_INFERENCE_KINDS: list[tuple[str, Exception]] = [
    ("value_error", ValueError("v")),
    ("file_not_found", FileNotFoundError("f")),
    ("runtime_error", RuntimeError("x")),
    ("unsupported_profile", UnsupportedProfileError("u")),
    ("license", RestrictedBackendError("l")),
    ("transcription", TranscriptionError("tx")),
    ("fast:timeout", InferenceTimeoutError("t")),
    ("fast:execution", InferenceExecutionError("e")),
    ("fast:model_load", ModelLoadError("m")),
    ("fast:model_unavailable", ModelUnavailableError("m")),
    ("medium:timeout", InferenceTimeoutError("t")),
    ("medium:execution", InferenceExecutionError("e")),
    ("medium:model_load", ModelLoadError("m")),
    ("medium:model_unavailable", ModelUnavailableError("m")),
    ("medium:dependency", RuntimeDependencyError("d")),
    ("accurate:timeout", InferenceTimeoutError("t")),
    ("accurate:execution", InferenceExecutionError("e")),
    ("accurate:model_load", ModelLoadError("m")),
    ("accurate:model_unavailable", ModelUnavailableError("m")),
    ("accurate:dependency", RuntimeDependencyError("d")),
]

_TRAINING_KINDS: list[tuple[str, Exception]] = [
    ("training_readiness", TrainingNotReadyError("r")),
    ("training_quarantine", QuarantineBudgetExceeded("q")),
    ("training_prepared_plan", PreparedPlanError("p")),
    ("runtime_error", RuntimeError("x")),
    ("value_error", ValueError("v")),
]


@pytest.mark.parametrize("kind,ours", _INFERENCE_KINDS, ids=[k for k, _ in _INFERENCE_KINDS])
def test_inference_exception_exit_codes_match_reference(oracle, kind, ours):
    expected = oracle.call("classify_inference_exception", kind=kind)
    assert classify_exit_code(ours, workflow="inference") == expected["exit_code"]


@pytest.mark.parametrize("kind,ours", _TRAINING_KINDS, ids=[k for k, _ in _TRAINING_KINDS])
def test_training_exception_exit_codes_match_reference(oracle, kind, ours):
    expected = oracle.call("classify_training_exception", kind=kind)
    assert classify_exit_code(ours, workflow="training") == expected["exit_code"]


# --------------------------------------------------------------------------- #
# Calibration reference-subset selection
# --------------------------------------------------------------------------- #

_STEMS = st.one_of(
    # Well-formed RAVDESS: modality-channel-emotion-intensity-statement-rep-actor
    st.tuples(
        st.sampled_from(["01", "02", "03"]),
        st.sampled_from(["01", "02"]),
        st.sampled_from(["01", "02", "03", "04", "05", "06", "07", "08"]),
        st.sampled_from(["01", "02"]),
        st.sampled_from(["01", "02", "03"]),  # 03 = no canonical sentence
        st.sampled_from(["01", "02"]),
        st.integers(min_value=1, max_value=24),
    ).map(lambda t: "-".join([*t[:6], f"{t[6]:02d}"])),
    # Malformed / foreign names the selector must skip identically
    st.sampled_from(["clip", "03-01-05", "a-b-c-d-e", "1234_0001_ANG", "03-01-01-01"]),
)


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    stems=st.lists(_STEMS, min_size=1, max_size=60),
    limit=st.integers(min_value=1, max_value=30),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_stratified_subset_matches_reference(oracle, stems, limit, seed):
    paths = [f"corpus/{stem}.wav" for stem in stems]
    expected = oracle.call("stratified_subset", paths=paths, limit=limit, seed=seed)
    ours = stratified_reference_subset(
        [Path(p) for p in paths], limit=limit, random_seed=seed
    )
    assert [str(p) for p in ours] == expected


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(stems=st.lists(_STEMS, min_size=0, max_size=40))
def test_reference_text_and_coverage_match_reference(oracle, stems):
    paths = [f"Actor_01/{stem}.wav" for stem in stems]
    for path in paths[:8]:
        assert ravdess_reference_text(Path(path)) == oracle.call(
            "ravdess_reference_text", path=path
        )
    assert summarize_subset_coverage([Path(p) for p in paths]) == oracle.call(
        "subset_coverage", paths=paths
    )


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.too_slow])
@given(
    stems=st.lists(_STEMS, min_size=1, max_size=40),
    limit=st.one_of(st.none(), st.integers(min_value=1, max_value=20)),
    strategy=st.sampled_from(["stratified", "head"]),
    seed=st.integers(min_value=0, max_value=1000),
)
def test_collect_reference_files_matches_reference(oracle, stems, limit, strategy, seed):
    paths = [f"data/{stem}.wav" for stem in stems]
    expected = oracle.call(
        "collect_reference_files", paths=paths, limit=limit, strategy=strategy, seed=seed
    )
    ours = collect_reference_samples(
        paths, limit=limit, sampling_strategy=strategy, random_seed=seed
    )
    assert [path for path, _text in ours] == expected
    # The paired canonical sentences must agree with the reference lookup too.
    for path, text in ours[:8]:
        assert text == (oracle.call("ravdess_reference_text", path=path) or "")


def test_collect_rejects_nonpositive_limit_like_reference(oracle):
    with pytest.raises(ValueError):
        collect_reference_samples(["a.wav"], limit=0)
    with pytest.raises(Exception) as err:
        oracle.call("collect_reference_files", paths=["a.wav"], limit=0, strategy="head", seed=1)
    assert "positive" in str(err.value)
