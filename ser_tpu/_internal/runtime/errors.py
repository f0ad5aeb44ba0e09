"""Inference error taxonomy shared by every profile boundary.

Parity surface: reference per-profile taxonomies (e.g.
``ser/_internal/runtime/medium_inference.py:16-37``) — the same six error
kinds, here as one shared hierarchy parameterized by profile so the retry
policy, exit-code classification, and cross-worker rehydration treat all
profiles uniformly.
"""

from __future__ import annotations


class InferenceError(RuntimeError):
    """Base class for profile inference failures."""

    def __init__(self, message: str, *, profile: str | None = None) -> None:
        super().__init__(message)
        self.profile = profile


class ModelUnavailableError(InferenceError):
    """No trained artifact is available for the requested profile/model."""


class RuntimeDependencyError(InferenceError):
    """A required runtime dependency (module, asset) is missing."""


class ModelLoadError(InferenceError):
    """The artifact exists but could not be loaded or failed compat checks."""


class InferenceTimeoutError(InferenceError):
    """The compute phase exceeded its per-attempt timeout budget."""


class TransientInferenceError(InferenceError):
    """A retryable failure (device hiccup, OOM after release, IO race).

    ``hard_oom=True`` marks a deterministic device OOM (the same allocation
    will fail again on this device) — eligible for the hard-OOM failover
    shortcut (reference ``stable_whisper_transcribe_runtime.py:20-45``:
    ``FAILOVER_CPU_NOW`` vs ``RETRY_NEXT_PRECISION`` when disabled).
    """

    def __init__(
        self, message: str, *, profile: str | None = None, hard_oom: bool = False
    ) -> None:
        super().__init__(message, profile=profile)
        self.hard_oom = hard_oom


class InferenceExecutionError(InferenceError):
    """A non-retryable execution failure."""


#: Wire-stable names used across worker process boundaries.
_ERROR_KINDS: dict[str, type[InferenceError]] = {
    "model_unavailable": ModelUnavailableError,
    "runtime_dependency": RuntimeDependencyError,
    "model_load": ModelLoadError,
    "timeout": InferenceTimeoutError,
    "transient": TransientInferenceError,
    "execution": InferenceExecutionError,
}
_KIND_BY_TYPE = {cls: kind for kind, cls in _ERROR_KINDS.items()}


def error_kind(error: BaseException) -> str:
    """Stable kind string for one error instance (default: execution)."""
    for cls in type(error).__mro__:
        if cls in _KIND_BY_TYPE:
            return _KIND_BY_TYPE[cls]
    return "execution"


def rehydrate_error(kind: str, message: str, *, profile: str | None = None) -> InferenceError:
    """Rebuilds a typed error from its wire form (worker → parent)."""
    return _ERROR_KINDS.get(kind, InferenceExecutionError)(message, profile=profile)


__all__ = [
    "InferenceError",
    "InferenceExecutionError",
    "InferenceTimeoutError",
    "ModelLoadError",
    "ModelUnavailableError",
    "RuntimeDependencyError",
    "TransientInferenceError",
    "error_kind",
    "rehydrate_error",
]
