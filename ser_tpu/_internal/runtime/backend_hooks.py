"""Backend hook construction: {backend_id → inference callable}.

Parity surface: reference ``ser/_internal/runtime/backend_hooks.py:95-240`` —
hooks exist only for profiles whose enable flag is on, whose required modules
import, and (for restricted backends) whose license consent is recorded.
"""

from __future__ import annotations

import importlib.util
from collections.abc import Callable

from ser_tpu._internal.config.schema import AppConfig, profile_artifact_file_names
from ser_tpu._internal.runtime import restricted_backends
from ser_tpu._internal.runtime.fast_boundary import run_fast_inference
from ser_tpu._internal.runtime.profile_boundary import (
    ProfileBoundarySpec,
    run_profile_inference,
)
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.profiles import ProfileName, get_profile_catalog
from ser_tpu.runtime.contracts import InferenceRequest
from ser_tpu.runtime.schema import InferenceResult

logger = get_logger(__name__)

type BackendHook = Callable[[InferenceRequest], InferenceResult]


def _profile_enabled(profile: ProfileName, settings: AppConfig) -> bool:
    flags = settings.runtime_flags
    return {
        "fast": True,
        "medium": flags.medium_profile,
        "accurate": flags.accurate_profile,
        "accurate-research": flags.accurate_research_profile,
    }[profile]


def _modules_available(profile: ProfileName) -> bool:
    spec = get_profile_catalog()[profile]
    return all(importlib.util.find_spec(m) is not None for m in spec.required_modules)


def _model_id_for(profile: ProfileName, settings: AppConfig) -> str | None:
    return {
        "fast": None,
        "medium": settings.models.medium_model_id,
        "accurate": settings.models.accurate_model_id,
        "accurate-research": settings.models.accurate_research_model_id,
    }[profile]


def _build_profile_backend(profile: ProfileName, settings: AppConfig, device_kind: str):
    """Module-level factory body (picklable via ``partial`` for spawn workers)."""
    from ser_tpu._internal.repr import encoders

    return encoders.build_encoder_backend(
        profile, settings=settings, device_kind=device_kind
    )


def _encoder_backend_factory(profile: ProfileName):
    """Lazy, PICKLABLE factory for the profile's JAX encoder backend."""
    import functools

    return functools.partial(_build_profile_backend, profile)


def build_profile_spec(profile: ProfileName, settings: AppConfig) -> ProfileBoundarySpec:
    """The boundary spec for one windowed profile (shared with spawn workers,
    which rebuild it from the child's own settings)."""
    catalog_spec = get_profile_catalog()[profile]
    artifact_names = profile_artifact_file_names(
        profile=profile,
        medium_model_id=settings.models.medium_model_id,
        accurate_model_id=settings.models.accurate_model_id,
        accurate_research_model_id=settings.models.accurate_research_model_id,
    )
    return ProfileBoundarySpec(
        profile=profile,
        backend_id=catalog_spec.backend_id,
        model_id=_model_id_for(profile, settings),
        pooling_strategy="mean_std",
        backend_factory=_encoder_backend_factory(profile),
        artifact_file_name=artifact_names[0],
    )


def _windowed_hook(profile: ProfileName, settings: AppConfig) -> BackendHook:
    spec = build_profile_spec(profile, settings)

    def hook(request: InferenceRequest) -> InferenceResult:
        return run_profile_inference(request, spec=spec, settings=settings)

    return hook


def build_backend_hooks(settings: AppConfig) -> dict[str, BackendHook]:
    """Builds the available backend hooks for the active settings snapshot."""
    hooks: dict[str, BackendHook] = {}
    catalog = get_profile_catalog()
    for profile in catalog:
        spec = catalog[profile]
        if not _profile_enabled(profile, settings):
            continue
        if not _modules_available(profile):
            logger.debug("Profile %s modules unavailable; hook skipped.", profile)
            continue
        if spec.backend_id in restricted_backends.RESTRICTED_BACKEND_POLICIES:
            try:
                restricted_backends.ensure_backend_access(
                    spec.backend_id, settings=settings
                )
            except restricted_backends.RestrictedBackendError as err:
                logger.debug("Restricted backend %s gated: %s", spec.backend_id, err)
                continue
        if profile == "fast":
            hooks[spec.backend_id] = (
                lambda request, s=settings: run_fast_inference(request, settings=s)
            )
        else:
            hooks[spec.backend_id] = _windowed_hook(profile, settings)
    return hooks


__all__ = ["BackendHook", "build_backend_hooks"]
