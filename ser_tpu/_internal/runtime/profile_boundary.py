"""Generic per-profile inference boundary: load → attempt → retry → fallback.

Parity surface: reference ``{fast,medium,accurate}_public_boundary.py``
(~2,400 LoC of near-identical per-profile orchestration) collapsed into ONE
parameterized boundary:

- single-flight lock per (profile, model_id) (reference
  ``medium_public_boundary.py:524-527``),
- artifact load with backend/profile/model-id compat filters,
- attempt execution with compute-only timeout (in-process soft timeout by
  default; spawned worker when ``process_isolation`` is set — viable only for
  CPU backends, see ``worker_lifecycle.py``),
- retry policy with separate timeout/transient budgets and a CPU fallback
  after the accelerator transient budget is exhausted
  (``medium_public_boundary.py:548-561``).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass
from typing import Any

import numpy as np

from ser_tpu._internal.config.schema import AppConfig, ProfileRuntimeConfig
from ser_tpu._internal.models import artifacts
from ser_tpu._internal.runtime import worker_lifecycle
from ser_tpu._internal.runtime.errors import (
    InferenceError,
    InferenceExecutionError,
    ModelLoadError,
    ModelUnavailableError,
)
from ser_tpu._internal.runtime.policy import RetryPolicy, run_with_retry_policy
from ser_tpu._internal.runtime.postprocessing import build_segment_postprocessing_config
from ser_tpu._internal.runtime.profile_execution import run_windowed_inference_once
from ser_tpu._internal.runtime.single_flight import GLOBAL_SINGLE_FLIGHT
from ser_tpu._internal.utils.audio_io import read_audio_file
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.profiles import ProfileName
from ser_tpu.runtime.contracts import InferenceRequest
from ser_tpu.runtime.schema import InferenceResult

logger = get_logger(__name__)

type BackendFactory = Callable[[AppConfig, str], Any]  # (settings, device_kind) -> backend


@dataclass(frozen=True)
class ProfileBoundarySpec:
    """Everything the generic boundary needs to run one profile."""

    profile: ProfileName
    backend_id: str
    model_id: str | None
    pooling_strategy: str  # "mean" | "mean_std"
    backend_factory: BackendFactory
    artifact_file_name: str


def _runtime_config(settings: AppConfig, profile: ProfileName) -> ProfileRuntimeConfig:
    return settings.profile_runtime(profile)  # type: ignore[arg-type]


def _load_model(spec: ProfileBoundarySpec, settings: AppConfig) -> artifacts.LoadedModel:
    path = settings.models.folder / spec.artifact_file_name
    try:
        return artifacts.load_model_artifact(
            path,
            expected_backend_id=spec.backend_id,
            expected_profile=spec.profile,
            expected_model_id=spec.model_id,
        )
    except FileNotFoundError as err:
        raise ModelUnavailableError(
            f"No trained artifact for profile {spec.profile!r} at {path}. "
            "Run `ser --train` for this profile first.",
            profile=spec.profile,
        ) from err
    except artifacts.ArtifactError as err:
        raise ModelLoadError(str(err), profile=spec.profile) from err


def _cpu_device_scope(device_kind: str):
    """Device-placement scope for one attempt.

    ``"cpu"`` pins array creation (and therefore jit dispatch, which follows
    input placement) onto the host CPU backend — the CPU-fallback attempt
    must actually leave the accelerator, not merely be named "cpu".
    """
    if device_kind != "cpu":
        from contextlib import nullcontext

        return nullcontext()
    import jax

    return jax.default_device(jax.devices("cpu")[0])


def _spawned_setup(profile: ProfileName, file_path: str) -> dict[str, Any]:
    """Spawned-worker setup: rebuild everything from the child's environment.

    Spawn semantics match the transcription worker (``extractor.py``):
    parent ContextVar overrides do not cross the process boundary; the child
    re-derives settings from env. Module-level + ``partial`` so the payload
    pickles (local closures cannot).
    """
    from ser_tpu._internal.config.bootstrap import get_settings
    from ser_tpu._internal.runtime.backend_hooks import build_profile_spec

    settings = get_settings()
    spec = build_profile_spec(profile, settings)
    runtime = _runtime_config(settings, profile)
    loaded = _load_model(spec, settings)
    backend = spec.backend_factory(settings, "auto")
    audio, sample_rate = read_audio_file(
        file_path, audio_read_config=settings.audio_read
    )
    return {
        "backend": backend,
        "audio": audio,
        "sample_rate": sample_rate,
        "model": loaded.model,
        "expected_feature_size": loaded.expected_feature_size,
        "runtime": runtime,
        "spec": spec,
        "settings": settings,
    }


def _spawned_compute(context: dict[str, Any]) -> InferenceResult:
    runtime = context["runtime"]
    spec = context["spec"]
    settings = context["settings"]
    return run_windowed_inference_once(
        audio=np.asarray(context["audio"], dtype=np.float32),
        sample_rate=context["sample_rate"],
        backend=context["backend"],
        model=context["model"],
        pool_window_size_seconds=runtime.pool_window_size_seconds,
        pool_window_stride_seconds=runtime.pool_window_stride_seconds,
        pooling_strategy=spec.pooling_strategy,
        postprocessing_config=build_segment_postprocessing_config(runtime),
        output_schema_version=settings.schema.output_schema_version,
        expected_feature_size=context["expected_feature_size"],
    )


def run_profile_inference(
    request: InferenceRequest,
    *,
    spec: ProfileBoundarySpec,
    settings: AppConfig,
) -> InferenceResult:
    """Runs one windowed-profile inference under the full runtime discipline."""
    runtime = _runtime_config(settings, spec.profile)
    model_key = spec.model_id or "default"

    with GLOBAL_SINGLE_FLIGHT.acquire(spec.profile, model_key):
        loaded = _load_model(spec, settings)

        def make_attempt(device_kind: str) -> Callable[[], InferenceResult]:
            def setup() -> dict[str, Any]:
                with _cpu_device_scope(device_kind):
                    backend = spec.backend_factory(settings, device_kind)
                    audio, sample_rate = read_audio_file(
                        request.file_path, audio_read_config=settings.audio_read
                    )
                return {"backend": backend, "audio": audio, "sample_rate": sample_rate}

            def compute(context: dict[str, Any]) -> InferenceResult:
                with _cpu_device_scope(device_kind):
                    return run_windowed_inference_once(
                        audio=np.asarray(context["audio"], dtype=np.float32),
                        sample_rate=context["sample_rate"],
                        backend=context["backend"],
                        model=loaded.model,
                        pool_window_size_seconds=runtime.pool_window_size_seconds,
                        pool_window_stride_seconds=runtime.pool_window_stride_seconds,
                        pooling_strategy=spec.pooling_strategy,  # type: ignore[arg-type]
                        postprocessing_config=build_segment_postprocessing_config(runtime),
                        output_schema_version=settings.schema.output_schema_version,
                        expected_feature_size=loaded.expected_feature_size,
                    )

            def attempt() -> InferenceResult:
                try:
                    if runtime.process_isolation:
                        from functools import partial

                        # Module-level payload: local closures cannot pickle
                        # across the spawn boundary.
                        return worker_lifecycle.run_attempt_in_spawned_process(
                            setup=partial(_spawned_setup, spec.profile, request.file_path),
                            compute=_spawned_compute,
                            timeout_seconds=runtime.timeout_seconds,
                            profile=spec.profile,
                        )
                    return worker_lifecycle.run_attempt_in_process(
                        setup=setup,
                        compute=compute,
                        timeout_seconds=runtime.timeout_seconds,
                        profile=spec.profile,
                    )
                except (InferenceError, FileNotFoundError, ValueError):
                    raise  # typed / validation errors keep their classification
                except Exception as err:
                    from ser_tpu._internal.runtime.oom import is_device_oom, parse_device_oom

                    if is_device_oom(err):
                        info = parse_device_oom(err)
                        detail = (
                            f" (requested {info.requested_bytes} B)"
                            if info.requested_bytes
                            else ""
                        )
                        from ser_tpu._internal.runtime.errors import TransientInferenceError

                        raise TransientInferenceError(
                            f"Device OOM during inference{detail}; retry/fallback eligible.",
                            profile=spec.profile,
                            hard_oom=True,
                        ) from err
                    raise InferenceExecutionError(
                        f"{type(err).__name__}: {err}", profile=spec.profile
                    ) from err

            return attempt

        policy = RetryPolicy(
            max_timeout_retries=runtime.max_timeout_retries,
            max_transient_retries=runtime.max_transient_retries,
            retry_backoff_seconds=runtime.retry_backoff_seconds,
            hard_oom_failover_now=settings.transcription.hbm_hard_oom_shortcut_enabled,
        )
        return run_with_retry_policy(
            make_attempt("auto"),
            policy=policy,
            on_exhausted_transient=make_attempt("cpu"),
        )


__all__ = ["BackendFactory", "ProfileBoundarySpec", "run_profile_inference"]
