"""Encoder-backend construction for transformer profiles (medium/accurate/research).

Builds the profile's JAX encoder backend (wav2vec2-XLS-R class, Whisper
encoder, emotion2vec class — see ``ser_tpu/models``) with the runtime-policy
resolved device/dtype. Weights load from the local HF-format cache; this
framework performs no network access, so missing weights surface as a typed
runtime-dependency error (reference analogue: ``hf_xlsr.py`` model resolution
+ ``registry.py`` missing-module reporting).
"""

from __future__ import annotations

import threading

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.repr.runtime_policy import resolve_feature_runtime
from ser_tpu._internal.runtime.errors import RuntimeDependencyError
from ser_tpu.profiles import ProfileName, get_profile_catalog

#: Backend instances are expensive (weights in HBM, warmed jit caches) — reuse
#: them per (backend_id, model_id, dtype, cpu?, cache_root, random-init?)
#: across attempts. Weight PROVENANCE is part of the key: changing the cache
#: root or the SER_ALLOW_RANDOM_INIT mode mid-process must not silently hand
#: back an instance holding the previous weights.
_BACKEND_CACHE: dict[tuple, object] = {}
_BACKEND_CACHE_LOCK = threading.Lock()


def resolved_model_id(profile: ProfileName, settings: AppConfig) -> str:
    """The model id the backend will ACTUALLY load (settings override wins).

    Everything that keys on model identity — embedding caches, artifact
    metadata, compat checks — must use this, not the catalog default:
    training with an overridden id while stamping the default silently
    reused wrong-model cache entries and produced artifacts that failed
    their own load-time model-id check.
    """
    return {
        "medium": settings.models.medium_model_id,
        "accurate": settings.models.accurate_model_id,
        "accurate-research": settings.models.accurate_research_model_id,
    }.get(profile, "")


def build_encoder_backend(
    profile: ProfileName, *, settings: AppConfig, device_kind: str = "auto"
):
    """Builds (or reuses) the encoder FeatureBackend for one transformer profile."""
    spec = get_profile_catalog()[profile]
    model_id = resolved_model_id(profile, settings)
    runtime_probe = resolve_feature_runtime(
        spec.backend_id,
        torch_runtime=settings.torch_runtime,
        policy=settings.feature_runtime_policy,
    )
    import os

    dtype_probe = runtime_probe.dtype if device_kind != "cpu" else "float32"
    # Device in the key: the CPU-fallback attempt must not receive the
    # accelerator-resident instance (weights placed where first built).
    cache_key = (
        spec.backend_id,
        model_id,
        dtype_probe,
        device_kind == "cpu",
        str(settings.models.huggingface_cache_root),
        os.environ.get("SER_ALLOW_RANDOM_INIT", "") == "1",
        os.environ.get("SER_RANDOM_INIT_SIZE", "tiny"),
    )
    with _BACKEND_CACHE_LOCK:
        cached = _BACKEND_CACHE.get(cache_key)
        if cached is not None:
            return cached
    # Build OUTSIDE the lock: checkpoint conversion takes tens of seconds and
    # must not block unrelated cache hits. A racing duplicate build is
    # tolerable; last writer wins.
    backend = _build_encoder_backend_uncached(
        profile, settings=settings, device_kind=device_kind, model_id=model_id
    )
    with _BACKEND_CACHE_LOCK:
        return _BACKEND_CACHE.setdefault(cache_key, backend)


def _build_encoder_backend_uncached(
    profile: ProfileName,
    *,
    settings: AppConfig,
    device_kind: str = "auto",
    model_id: str | None = None,
):
    spec = get_profile_catalog()[profile]
    # One resolution point: the cache key and the loaded weights must agree.
    model_id = model_id if model_id is not None else resolved_model_id(profile, settings)
    runtime = resolve_feature_runtime(
        spec.backend_id,
        torch_runtime=settings.torch_runtime,
        policy=settings.feature_runtime_policy,
    )
    dtype = runtime.dtype if device_kind != "cpu" else "float32"

    if spec.backend_id == "jax_xlsr":
        from ser_tpu._internal.repr.wav2vec2_backend import XlsrBackend

        return XlsrBackend(
            model_id=model_id,
            cache_root=settings.models.huggingface_cache_root,
            dtype=dtype,
        )
    if spec.backend_id == "jax_whisper_encoder":
        from ser_tpu._internal.repr.whisper_backend import WhisperEncoderBackend

        return WhisperEncoderBackend(
            model_id=model_id,
            cache_root=settings.models.huggingface_cache_root,
            dtype=dtype,
        )
    if spec.backend_id == "emotion2vec":
        from ser_tpu._internal.repr.emotion2vec_backend import Emotion2VecBackend

        return Emotion2VecBackend(
            model_id=model_id,
            cache_root=settings.models.huggingface_cache_root,
            # FunASR checkpoints stage under the ModelScope hub cache
            # (reference accurate_research_inference.py passes both roots).
            modelscope_cache_root=settings.models.modelscope_cache_root,
            dtype=dtype,
        )
    raise RuntimeDependencyError(
        f"No encoder backend registered for backend_id {spec.backend_id!r}.",
        profile=profile,
    )


__all__ = ["build_encoder_backend", "resolved_model_id"]
