"""Differential parity: retry-policy attempt sequences.

Reference stage: ``ser/_internal/runtime/policy.py:16-73`` — split timeout/
transient budgets, attempt counting, and the exhausted-transient outcome.
For every randomized failure sequence and budget pair, the number of
attempts consumed and the final outcome must match the reference exactly
(an off-by-one here silently halves or doubles production retry behavior).
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from ser_tpu._internal.runtime.errors import (
    InferenceTimeoutError,
    TransientInferenceError,
)
from ser_tpu._internal.runtime.policy import RetryPolicy, run_with_retry_policy


def _drive_ours(sequence, max_timeout, max_transient):
    attempts = {"n": 0}

    def attempt():
        attempts["n"] += 1
        step = sequence[min(attempts["n"] - 1, len(sequence) - 1)]
        if step == "timeout":
            raise InferenceTimeoutError("t", profile="parity")
        if step == "transient":
            raise TransientInferenceError("x")
        return "ok"

    policy = RetryPolicy(
        max_timeout_retries=max_timeout,
        max_transient_retries=max_transient,
        retry_backoff_seconds=0.0,
    )
    try:
        outcome = run_with_retry_policy(attempt, policy=policy, sleep=lambda _s: None)
    except InferenceTimeoutError:
        outcome = "timeout_raised"
    except TransientInferenceError:
        outcome = "transient_exhausted"
    return attempts["n"], outcome


@settings(max_examples=200, deadline=None)
@given(
    sequence=st.lists(
        st.sampled_from(["timeout", "transient", "ok"]), min_size=1, max_size=8
    ),
    max_timeout=st.integers(min_value=0, max_value=3),
    max_transient=st.integers(min_value=0, max_value=3),
)
def test_retry_sequence_parity(oracle, sequence, max_timeout, max_transient):
    ours_attempts, ours_outcome = _drive_ours(sequence, max_timeout, max_transient)
    theirs = oracle.call(
        "retry_policy",
        sequence=sequence,
        max_timeout_retries=max_timeout,
        max_transient_retries=max_transient,
    )
    assert (ours_attempts, ours_outcome) == (theirs["attempts"], theirs["outcome"])
