"""Artifact filename resolution scoped per (profile, model-id) tuple.

Interop surface: reference ``ser/_internal/config/artifact_naming.py:28-68`` —
the same stable sha1-suffixed naming scheme is used so trained artifacts keep
their identity when a user migrates between frameworks.
"""

from __future__ import annotations

import re
from hashlib import sha1
from typing import Literal

type ArtifactProfileName = Literal["fast", "medium", "accurate", "accurate-research"]

FAST_MODEL_FILE_NAME = "ser_model.pkl"
FAST_SECURE_MODEL_FILE_NAME = "ser_model.skops"
FAST_TRAINING_REPORT_FILE_NAME = "training_report.json"


def artifact_profile_from_runtime_flags(
    *,
    medium_profile: bool,
    accurate_profile: bool,
    accurate_research_profile: bool,
) -> ArtifactProfileName:
    """Resolves the artifact profile from runtime flags using runtime precedence."""
    if accurate_research_profile:
        return "accurate-research"
    if accurate_profile:
        return "accurate"
    if medium_profile:
        return "medium"
    return "fast"


def artifact_model_id_suffix(model_id: str) -> str:
    """Builds a stable, filename-safe suffix for one backend model id.

    The suffix is ``<sanitized-model-id[:48]>_<sha1(model_id)[:10]>`` so distinct
    model ids can never collide after sanitization.
    """
    sanitized = re.sub(r"[^a-zA-Z0-9._-]+", "_", model_id.strip().lower()).strip("._-")
    digest = sha1(model_id.encode("utf-8")).hexdigest()[:10]
    return f"{sanitized[:48] or 'model'}_{digest}"


def profile_artifact_file_names(
    *,
    profile: ArtifactProfileName,
    medium_model_id: str,
    accurate_model_id: str,
    accurate_research_model_id: str,
) -> tuple[str, str, str]:
    """Returns (model, secure_model, training_report) filenames for one profile."""
    if profile == "fast":
        return (
            FAST_MODEL_FILE_NAME,
            FAST_SECURE_MODEL_FILE_NAME,
            FAST_TRAINING_REPORT_FILE_NAME,
        )
    model_id = {
        "medium": medium_model_id,
        "accurate": accurate_model_id,
        "accurate-research": accurate_research_model_id,
    }[profile]
    token = profile.replace("-", "_")
    suffix = artifact_model_id_suffix(model_id)
    return (
        f"ser_model_{token}_{suffix}.pkl",
        f"ser_model_{token}_{suffix}.skops",
        f"training_report_{token}_{suffix}.json",
    )


__all__ = [
    "ArtifactProfileName",
    "FAST_MODEL_FILE_NAME",
    "FAST_SECURE_MODEL_FILE_NAME",
    "FAST_TRAINING_REPORT_FILE_NAME",
    "artifact_model_id_suffix",
    "artifact_profile_from_runtime_flags",
    "profile_artifact_file_names",
]
