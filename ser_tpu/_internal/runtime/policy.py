"""Retry policy with separate timeout and transient budgets.

Parity surface: reference ``ser/_internal/runtime/policy.py:16-73`` — timeout
retries and transient retries draw from independent budgets, with a fixed
backoff between attempts and a CPU-fallback hook after the accelerator's
transient budget is exhausted (reference ``medium_public_boundary.py:548-554``).
"""

from __future__ import annotations

import time
from collections.abc import Callable
from dataclasses import dataclass
from typing import TypeVar

from ser_tpu._internal.runtime.errors import InferenceTimeoutError, TransientInferenceError
from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)

T = TypeVar("T")


@dataclass(frozen=True)
class RetryPolicy:
    """Budgets for one profile's inference attempts."""

    max_timeout_retries: int = 0
    max_transient_retries: int = 0
    retry_backoff_seconds: float = 0.0
    #: Hard device OOMs (deterministic: the allocation will fail again) skip
    #: the remaining transient retries and run the fallback immediately
    #: (reference hard-OOM shortcut, SER_TRANSCRIPTION_*_HARD_OOM_SHORTCUT).
    hard_oom_failover_now: bool = True


def run_with_retry_policy(
    attempt: Callable[[], T],
    *,
    policy: RetryPolicy,
    on_exhausted_transient: Callable[[], T] | None = None,
    sleep: Callable[[float], None] = time.sleep,
) -> T:
    """Runs ``attempt`` under the retry policy.

    Timeout errors consume the timeout budget; transient errors the transient
    budget. When the transient budget is exhausted and a fallback is provided
    (e.g. retry on CPU), the fallback runs once instead of raising.
    """
    timeout_budget = max(0, policy.max_timeout_retries)
    transient_budget = max(0, policy.max_transient_retries)
    while True:
        try:
            return attempt()
        except InferenceTimeoutError:
            if timeout_budget <= 0:
                raise
            timeout_budget -= 1
            logger.warning(
                "Inference attempt timed out; retrying (%d timeout retries left).",
                timeout_budget,
            )
        except TransientInferenceError as err:
            if (
                getattr(err, "hard_oom", False)
                and policy.hard_oom_failover_now
                and on_exhausted_transient is not None
            ):
                # Retrying a deterministic OOM burns the whole backoff ladder
                # to reach the same fallback; shortcut straight to it.
                logger.warning(
                    "Hard device OOM (%s); failing over immediately.", err
                )
                return on_exhausted_transient()
            if transient_budget <= 0:
                if on_exhausted_transient is not None:
                    logger.warning("Transient budget exhausted; running fallback path.")
                    return on_exhausted_transient()
                raise
            transient_budget -= 1
            logger.warning(
                "Transient inference failure (%s); retrying (%d transient retries left).",
                err,
                transient_budget,
            )
        if policy.retry_backoff_seconds > 0:
            sleep(policy.retry_backoff_seconds)


__all__ = ["RetryPolicy", "run_with_retry_policy"]
