"""Versioned model-artifact envelope: build, persist, load, compat-check.

Parity surface: reference ``ser/_internal/models/artifact_envelope.py:22-160``
(v3 envelope, supported versions {2, 3}, metadata with backend/profile/model-id
/device/dtype/provenance used as load-time compatibility filters) and
``artifact_persistence.py:88-144`` (atomic writes). Payloads may be either a
``JaxMLPClassifier`` state dict (native) or a pickled sklearn estimator
(migration path for reference-trained artifacts) — all inference paths
duck-type ``predict`` / ``predict_proba`` / ``classes_``.
"""

from __future__ import annotations

import json
import os
import pickle
import re
import tempfile
from pathlib import Path
from typing import Any, NamedTuple

from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.models.mlp_head import JaxMLPClassifier
from ser_tpu.runtime.schema import ARTIFACT_SCHEMA_VERSION

logger = get_logger(__name__)

MODEL_ARTIFACT_VERSION = 3
SUPPORTED_MODEL_ARTIFACT_VERSIONS = frozenset({2, MODEL_ARTIFACT_VERSION})
DEFAULT_BACKEND_ID = "handcrafted"
DEFAULT_PROFILE_ID = "fast"
#: v3 provenance digests are bare sha256 hex (reference
#: ``artifact_metadata.py:198-208`` ``_SHA256_PATTERN``).
_SHA256_HEX = re.compile(r"[0-9a-f]{64}")


class ArtifactError(ValueError):
    """Raised for malformed or incompatible model artifacts."""


class LoadedModel(NamedTuple):
    """Loaded model object and optional expected feature-vector length."""

    model: Any
    expected_feature_size: int | None
    artifact_metadata: dict[str, Any] | None = None


def build_artifact_metadata(
    *,
    feature_vector_size: int,
    training_samples: int,
    labels: list[str],
    backend_id: str = DEFAULT_BACKEND_ID,
    profile: str = DEFAULT_PROFILE_ID,
    feature_dim: int | None = None,
    frame_size_seconds: float = 3.0,
    frame_stride_seconds: float = 1.0,
    pooling_strategy: str = "mean",
    backend_model_id: str | None = None,
    model_revision: str | None = None,
    device: str | None = None,
    dtype: str | None = None,
    provenance: dict[str, Any] | None = None,
    seed: int | None = None,
    evaluation_summary: dict[str, Any] | None = None,
    recipe_digest: str | None = None,
    split_ledger_digest: str | None = None,
) -> dict[str, Any]:
    """Builds normalized v3 artifact metadata.

    ``recipe_digest``/``split_ledger_digest`` are the reference's v3
    dataset-provenance fields (``artifact_envelope.py:66-67``) — optional,
    sha256 hex when present, and included only when set (the reference writer
    drops None values, ``artifact_metadata.py:303-310``).
    """
    if feature_vector_size <= 0:
        raise ArtifactError("feature_vector_size must be positive.")
    if training_samples <= 0:
        raise ArtifactError("training_samples must be positive.")
    if not labels:
        raise ArtifactError("labels must be non-empty.")
    for name, digest in (
        ("recipe_digest", recipe_digest),
        ("split_ledger_digest", split_ledger_digest),
    ):
        if digest is not None and _SHA256_HEX.fullmatch(digest) is None:
            raise ArtifactError(f"Artifact metadata {name!r} must be sha256 hex.")
    from datetime import UTC, datetime

    optional_digests = {
        name: digest
        for name, digest in (
            ("recipe_digest", recipe_digest),
            ("split_ledger_digest", split_ledger_digest),
        )
        if digest is not None
    }
    return {
        **optional_digests,
        "artifact_version": MODEL_ARTIFACT_VERSION,
        "artifact_schema_version": ARTIFACT_SCHEMA_VERSION,
        "created_at_utc": datetime.now(tz=UTC).isoformat(),
        "feature_vector_size": int(feature_vector_size),
        "training_samples": int(training_samples),
        "labels": [str(label) for label in labels],
        "backend_id": backend_id,
        "profile": profile,
        # The reference resolves an unset feature_dim to the vector size and
        # REQUIRES equality at load time (artifact_metadata.py:109-111,164).
        "feature_dim": int(feature_dim) if feature_dim is not None else int(feature_vector_size),
        "frame_size_seconds": float(frame_size_seconds),
        "frame_stride_seconds": float(frame_stride_seconds),
        "pooling_strategy": pooling_strategy,
        "backend_model_id": backend_model_id,
        "model_revision": model_revision,
        "device": device,
        "dtype": dtype,
        "provenance": provenance or {},
        "task_heads": ["primary_emotion"],
        "seed": seed,
        # JSON objects, never None: the reference's load-time normalization
        # rejects null values here (artifact_metadata.py:254-255,310-311).
        "sampling_policy": {},
        "evaluation_summary": evaluation_summary or {},
    }


def build_model_artifact(model: Any, metadata: dict[str, Any]) -> dict[str, Any]:
    """Wraps a model + metadata into a persistable envelope dict.

    The version rides at BOTH the envelope top level and inside the metadata
    (reference ``artifact_loading.py:56-110`` validates both and their
    equality) — an artifact trained here must load in the reference and vice
    versa; this is the drop-in-switch contract.
    """
    payload: Any
    if isinstance(model, JaxMLPClassifier):
        payload = model.get_state()
    else:
        payload = model  # sklearn estimators and test doubles pickle directly
    version = dict(metadata).get("artifact_version", MODEL_ARTIFACT_VERSION)
    return {"artifact_version": version, "model": payload, "metadata": dict(metadata)}


def _rehydrate_model(payload: Any) -> Any:
    if isinstance(payload, dict) and payload.get("kind") == "ser_tpu_mlp":
        return JaxMLPClassifier.from_state(payload)
    return payload


def save_model_artifact(envelope: dict[str, Any], path: str | Path) -> str:
    """Atomically persists one artifact envelope (write-temp + rename).

    Also writes a sidecar ``<name>.meta.json`` with the metadata for
    inspection without unpickling (the TPU-native replacement for the
    reference's skops secure twin).
    """
    target = Path(path)
    target.parent.mkdir(parents=True, exist_ok=True)
    fd, tmp_name = tempfile.mkstemp(dir=target.parent, prefix=f".{target.name}.")
    try:
        with os.fdopen(fd, "wb") as handle:
            pickle.dump(envelope, handle, protocol=pickle.HIGHEST_PROTOCOL)
        # mkstemp creates 0600; published artifacts follow the umask like the
        # JSON sidecar does (otherwise a service account cannot load a model
        # trained by CI).
        umask = os.umask(0)
        os.umask(umask)
        os.chmod(tmp_name, 0o666 & ~umask)
        os.replace(tmp_name, target)
    except BaseException:
        if os.path.exists(tmp_name):
            os.unlink(tmp_name)
        raise
    meta_path = target.with_suffix(target.suffix + ".meta.json")
    try:
        meta_path.write_text(
            json.dumps(envelope.get("metadata", {}), indent=2, default=str), encoding="utf-8"
        )
    except OSError:
        logger.warning("Could not write metadata sidecar %s", meta_path)
    return str(target)


def load_model_artifact(
    path: str | Path,
    *,
    expected_backend_id: str | None = None,
    expected_profile: str | None = None,
    expected_model_id: str | None = None,
) -> LoadedModel:
    """Loads one artifact and enforces metadata compatibility filters.

    Raises ``ArtifactError`` on version/backend/profile/model-id mismatch —
    silently running a model trained for another backend would produce garbage
    predictions with full confidence. Legacy bare-estimator pickles
    (pre-envelope sklearn artifacts — the reference-migration path) carry no
    metadata to validate; they load with a LOUD warning naming the filters
    that could not be checked, and the feature-size check downstream remains
    the only guard.
    """
    target = Path(path)
    if not target.exists():
        raise FileNotFoundError(f"Model artifact not found: {path}")
    with target.open("rb") as handle:
        raw = pickle.load(handle)

    if not isinstance(raw, dict) or "model" not in raw:
        unverifiable = [
            name
            for name, value in (
                ("backend", expected_backend_id),
                ("profile", expected_profile),
                ("model-id", expected_model_id),
            )
            if value is not None
        ]
        if unverifiable:
            logger.warning(
                "Legacy artifact %s carries no metadata; %s compatibility "
                "cannot be verified. Re-train to produce an envelope-v3 "
                "artifact.",
                target,
                "/".join(unverifiable),
            )
        return LoadedModel(model=_rehydrate_model(raw), expected_feature_size=None)

    metadata = raw.get("metadata") or {}
    version = metadata.get("artifact_version")
    if version not in SUPPORTED_MODEL_ARTIFACT_VERSIONS:
        raise ArtifactError(
            f"Unsupported artifact version {version!r}; "
            f"supported: {sorted(SUPPORTED_MODEL_ARTIFACT_VERSIONS)}."
        )
    envelope_version = raw.get("artifact_version", version)
    if envelope_version != version:
        # Reference ``artifact_loading.py:108-109``: a version split between
        # envelope and metadata means a hand-edited or corrupted artifact.
        raise ArtifactError(
            "Model artifact envelope and metadata versions must match "
            f"(envelope {envelope_version!r} vs metadata {version!r})."
        )
    if expected_backend_id is not None:
        found = metadata.get("backend_id", DEFAULT_BACKEND_ID)
        if found != expected_backend_id:
            raise ArtifactError(
                f"Artifact backend mismatch: expected {expected_backend_id!r}, found {found!r}."
            )
    if expected_profile is not None:
        found = metadata.get("profile", DEFAULT_PROFILE_ID)
        if found != expected_profile:
            raise ArtifactError(
                f"Artifact profile mismatch: expected {expected_profile!r}, found {found!r}."
            )
    if expected_model_id is not None:
        found = metadata.get("backend_model_id")
        if found is not None and found != expected_model_id:
            raise ArtifactError(
                f"Artifact model-id mismatch: expected {expected_model_id!r}, found {found!r}."
            )

    # v3 provenance digests: optional, but when present they must be sha256
    # hex (reference load-time normalization, artifact_metadata.py:202-208 —
    # a malformed digest means a hand-edited artifact).
    for digest_field in ("recipe_digest", "split_ledger_digest"):
        digest_value = metadata.get(digest_field)
        if digest_value is not None and (
            not isinstance(digest_value, str)
            or _SHA256_HEX.fullmatch(digest_value) is None
        ):
            raise ArtifactError(
                f"Artifact metadata contains invalid {digest_field!r} value."
            )

    size = metadata.get("feature_vector_size")
    expected_size = int(size) if isinstance(size, int) and size > 0 else None
    feature_dim = metadata.get("feature_dim")
    if (
        expected_size is not None
        and isinstance(feature_dim, int)
        and feature_dim != expected_size
    ):
        raise ArtifactError(
            "Artifact metadata 'feature_dim' must match 'feature_vector_size' "
            f"({feature_dim} vs {expected_size})."
        )
    return LoadedModel(
        model=_rehydrate_model(raw["model"]),
        expected_feature_size=expected_size,
        artifact_metadata=metadata,
    )


def discover_artifact_candidates(folder: str | Path, stem_prefix: str = "ser_model") -> list[Path]:
    """Lists artifact candidates in a models folder, newest first.

    Reference behavior (``artifact_loading.py``): candidates are
    ``ser_model*.pkl`` files; metadata-aware filtering happens at load time.
    """
    root = Path(folder)
    if not root.is_dir():
        return []
    candidates = sorted(
        root.glob(f"{stem_prefix}*.pkl"), key=lambda p: p.stat().st_mtime, reverse=True
    )
    return candidates


__all__ = [
    "ArtifactError",
    "DEFAULT_BACKEND_ID",
    "DEFAULT_PROFILE_ID",
    "LoadedModel",
    "MODEL_ARTIFACT_VERSION",
    "SUPPORTED_MODEL_ARTIFACT_VERSIONS",
    "build_artifact_metadata",
    "build_model_artifact",
    "discover_artifact_candidates",
    "load_model_artifact",
    "save_model_artifact",
]
