"""Fast-profile inference boundary.

Parity surface: reference ``ser/_internal/runtime/fast_public_boundary.py`` —
single-flight model load, fast-path frame inference, and the fast profile's
(default zero) timeout/retry budgets.
"""

from __future__ import annotations

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.models import artifacts, emotion_model
from ser_tpu._internal.runtime.errors import (
    InferenceError,
    InferenceExecutionError,
    ModelLoadError,
    ModelUnavailableError,
)
from ser_tpu._internal.runtime.policy import RetryPolicy, run_with_retry_policy
from ser_tpu._internal.runtime.single_flight import GLOBAL_SINGLE_FLIGHT
from ser_tpu._internal.runtime.worker_lifecycle import run_attempt_in_process
from ser_tpu.runtime.contracts import InferenceRequest
from ser_tpu.runtime.schema import InferenceResult


def run_fast_inference(
    request: InferenceRequest, *, settings: AppConfig
) -> InferenceResult:
    """Runs fast-profile inference under the runtime discipline."""
    runtime = settings.fast_runtime
    with GLOBAL_SINGLE_FLIGHT.acquire("fast", "default"):
        try:
            loaded = emotion_model.load_model(settings=settings, profile="fast")
        except FileNotFoundError as err:
            raise ModelUnavailableError(
                f"No trained fast-profile artifact at {settings.models.model_file}. "
                "Run `ser --train` first.",
                profile="fast",
            ) from err
        except artifacts.ArtifactError as err:
            raise ModelLoadError(str(err), profile="fast") from err

        def attempt() -> InferenceResult:
            try:
                return run_attempt_in_process(
                    setup=lambda: None,
                    compute=lambda _: emotion_model.predict_emotions_detailed(
                        request.file_path, settings=settings, loaded=loaded
                    ),
                    timeout_seconds=runtime.timeout_seconds,
                    profile="fast",
                )
            except (InferenceError, FileNotFoundError, ValueError):
                raise  # typed / validation errors keep their classification
            except Exception as err:
                raise InferenceExecutionError(
                    f"{type(err).__name__}: {err}", profile="fast"
                ) from err

        return run_with_retry_policy(
            attempt,
            policy=RetryPolicy(
                max_timeout_retries=runtime.max_timeout_retries,
                max_transient_retries=runtime.max_transient_retries,
                retry_backoff_seconds=runtime.retry_backoff_seconds,
            ),
        )


__all__ = ["run_fast_inference"]
