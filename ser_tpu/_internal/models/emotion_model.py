"""Emotion model facade: train/load/predict entry points.

Parity surface: reference ``ser/_internal/models/emotion_model.py:57-179`` —
``train_model`` / ``load_model`` / ``predict_emotions`` /
``predict_emotions_detailed`` with profile-scoped artifact resolution, plus
the per-profile frame/pooling constants from ``profile_runtime.py:15-30``.
"""

from __future__ import annotations

from typing import Any

from ser_tpu._internal.config.bootstrap import reload_settings
from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.features import extract_feature_frames
from ser_tpu._internal.models import artifacts, fast_path
from ser_tpu._internal.models.fast_training import train_fast_model
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.domain import EmotionSegment
from ser_tpu.runtime.schema import InferenceResult, to_legacy_emotion_segments

logger = get_logger(__name__)

#: Per-profile encode framing constants (reference profile_runtime.py:15-30).
FAST_FRAME_SIZE_SECONDS = 3.0
FAST_FRAME_STRIDE_SECONDS = 1.0
MEDIUM_FRAME_SIZE_SECONDS = 1.0
MEDIUM_FRAME_STRIDE_SECONDS = 1.0
MEDIUM_POOLING_STRATEGY = "mean_std"


def _resolve(settings: AppConfig | None) -> AppConfig:
    return settings if settings is not None else reload_settings()


def train_model(*, settings: AppConfig | None = None) -> dict[str, Any]:
    """Trains the fast-profile model (the reference's legacy ``--train`` path)."""
    return train_fast_model(settings=_resolve(settings))


def load_model(
    *,
    settings: AppConfig | None = None,
    profile: str = "fast",
    expected_backend_id: str | None = None,
    expected_model_id: str | None = None,
) -> artifacts.LoadedModel:
    """Loads the persisted model artifact for one profile with compat checks."""
    settings = _resolve(settings)
    path = settings.models.model_file
    return artifacts.load_model_artifact(
        path,
        expected_backend_id=expected_backend_id,
        expected_profile=profile,
        expected_model_id=expected_model_id,
    )


def predict_emotions_detailed(
    file: str,
    *,
    settings: AppConfig | None = None,
    loaded: artifacts.LoadedModel | None = None,
) -> InferenceResult:
    """Fast-path detailed inference over one audio file."""
    settings = _resolve(settings)
    if loaded is None:
        loaded = load_model(settings=settings, profile="fast")

    def extract(path: str):
        return extract_feature_frames(
            path,
            frame_size_seconds=FAST_FRAME_SIZE_SECONDS,
            frame_stride_seconds=FAST_FRAME_STRIDE_SECONDS,
            feature_flags=settings.feature_flags,
            settings=settings,
        )

    return fast_path.predict_emotions_detailed_with_model(
        file,
        model=loaded.model,
        expected_feature_size=loaded.expected_feature_size,
        output_schema_version=settings.schema.output_schema_version,
        extract_feature_frames_fn=extract,
        logger=logger,
    )


def predict_emotions(
    file: str,
    *,
    settings: AppConfig | None = None,
    loaded: artifacts.LoadedModel | None = None,
) -> list[EmotionSegment]:
    """Legacy segment-only inference."""
    return to_legacy_emotion_segments(
        predict_emotions_detailed(file, settings=settings, loaded=loaded)
    )


__all__ = [
    "FAST_FRAME_SIZE_SECONDS",
    "FAST_FRAME_STRIDE_SECONDS",
    "MEDIUM_FRAME_SIZE_SECONDS",
    "MEDIUM_FRAME_STRIDE_SECONDS",
    "MEDIUM_POOLING_STRATEGY",
    "load_model",
    "predict_emotions",
    "predict_emotions_detailed",
    "train_model",
]
