"""Restricted-backend license policy and consent gating.

Parity surface: reference ``ser/_internal/runtime/restricted_backends.py`` +
``license_check.py:88-427`` — the emotion2vec backend requires explicit
opt-in via the ``SER_ENABLE_RESTRICTED_BACKENDS`` flag AND either the
``SER_ALLOWED_RESTRICTED_BACKENDS`` env allowlist or a persisted consent
record; consents carry the policy fingerprint so a policy change re-prompts.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from hashlib import sha256
from pathlib import Path

from ser_tpu._internal.config.schema import AppConfig, default_data_root
from ser_tpu._internal.utils.logger import get_logger

logger = get_logger(__name__)


class RestrictedBackendError(PermissionError):
    """Raised when a restricted backend is used without recorded consent."""


@dataclass(frozen=True)
class BackendPolicy:
    """License/usage policy for one restricted backend."""

    backend_id: str
    policy_id: str
    license_id: str
    notice: str

    @property
    def fingerprint(self) -> str:
        payload = f"{self.backend_id}|{self.policy_id}|{self.license_id}|{self.notice}"
        return sha256(payload.encode("utf-8")).hexdigest()[:16]


RESTRICTED_BACKEND_POLICIES: dict[str, BackendPolicy] = {
    "emotion2vec": BackendPolicy(
        backend_id="emotion2vec",
        policy_id="emotion2vec-research-v1",
        license_id="model-specific-research-license",
        notice=(
            "The emotion2vec model family is distributed under a research-oriented "
            "license. Confirm your use complies with the upstream model license "
            "before enabling this backend."
        ),
    ),
}


def _consent_store_path() -> Path:
    # Reference license_check.py:89,106-110: SER_RESTRICTED_BACKENDS_CONSENT_FILE
    # overrides the persisted consent-store location.
    import os

    explicit = os.environ.get("SER_RESTRICTED_BACKENDS_CONSENT_FILE", "").strip()
    if explicit:
        return Path(explicit).expanduser()
    return default_data_root() / "consents" / "restricted_backends.json"


def _read_consents() -> dict[str, str]:
    path = _consent_store_path()
    if not path.exists():
        return {}
    try:
        data = json.loads(path.read_text(encoding="utf-8"))
        return {str(k): str(v) for k, v in data.items()} if isinstance(data, dict) else {}
    except (OSError, json.JSONDecodeError):
        logger.warning("Unreadable restricted-backend consent store at %s", path)
        return {}


def record_backend_consent(backend_id: str) -> None:
    """Persists consent (policy-fingerprinted) for one restricted backend."""
    policy = RESTRICTED_BACKEND_POLICIES.get(backend_id)
    if policy is None:
        raise ValueError(f"Backend {backend_id!r} has no restricted policy to consent to.")
    consents = _read_consents()
    consents[backend_id] = policy.fingerprint
    path = _consent_store_path()
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(consents, indent=2), encoding="utf-8")


def build_provenance_metadata(
    *, settings: AppConfig, backend_id: str, profile: str
) -> dict[str, object]:
    """Machine-readable license/access provenance for artifact+report metadata.

    Parity surface: reference ``license_check.py:427-470``
    (``build_provenance_metadata``): code revision (``SER_CODE_REVISION``),
    a dependency fingerprint, and the backend's restricted-access facts at
    training time, so an artifact records under which policy and consent it
    was produced.
    """
    import os

    policy = RESTRICTED_BACKEND_POLICIES.get(backend_id)
    allowed_env = settings.runtime_flags.allowed_restricted_backends
    if policy is None:
        access_source = "unrestricted"
        access_allowed = True
    elif backend_id in allowed_env:
        access_source = "env_allowlist"
        access_allowed = settings.runtime_flags.restricted_backends
    elif _read_consents().get(backend_id) == policy.fingerprint:
        access_source = "persisted_consent"
        access_allowed = settings.runtime_flags.restricted_backends
    else:
        access_source = "denied"
        access_allowed = False
    provenance: dict[str, object] = {
        "code_revision": os.environ.get("SER_CODE_REVISION", "").strip() or "unknown",
        "dependency_manifest_fingerprint": _dependency_manifest_fingerprint(),
        "backend_id": backend_id,
        "profile": profile,
        "runtime_restricted_backends_enabled": settings.runtime_flags.restricted_backends,
        "backend_is_restricted": policy is not None,
        "backend_access_allowed": access_allowed,
        "backend_access_source": access_source,
    }
    if policy is not None:
        provenance["backend_license_id"] = policy.license_id
        provenance["restricted_backend_policy_fingerprint"] = policy.fingerprint
    return provenance


def _dependency_manifest_fingerprint() -> str:
    """Stable fingerprint of the compute-critical dependency versions."""
    import importlib

    parts = []
    for name in ("jax", "jaxlib", "flax", "optax", "numpy"):
        try:
            parts.append(f"{name}=={importlib.import_module(name).__version__}")
        except ImportError:
            parts.append(f"{name}==absent")
    return sha256("|".join(parts).encode("utf-8")).hexdigest()[:16]


def persist_all_restricted_backend_consents() -> int:
    """Persists consent for every known restricted backend; returns the count.

    Parity surface: reference ``restricted_backends.py:109-135`` — the
    ``--accept-all-restricted-backends`` CLI flag records policy-fingerprinted
    consent for ALL registered restricted backends in one invocation, usable
    as a standalone management command.
    """
    for backend_id in RESTRICTED_BACKEND_POLICIES:
        record_backend_consent(backend_id)
    return len(RESTRICTED_BACKEND_POLICIES)


def has_backend_consent(backend_id: str, *, allowed_env: tuple[str, ...] = ()) -> bool:
    """True when consent exists via env allowlist or fingerprint-matched store."""
    policy = RESTRICTED_BACKEND_POLICIES.get(backend_id)
    if policy is None:
        return True
    if backend_id in allowed_env:
        return True
    return _read_consents().get(backend_id) == policy.fingerprint


def ensure_backend_access(
    backend_id: str,
    *,
    settings: AppConfig,
    allowed_env: tuple[str, ...] = (),
) -> None:
    """Raises ``RestrictedBackendError`` when access is not granted."""
    policy = RESTRICTED_BACKEND_POLICIES.get(backend_id)
    if policy is None:
        return
    if not settings.runtime_flags.restricted_backends:
        raise RestrictedBackendError(
            f"Backend {backend_id!r} is restricted. Enable it with "
            "SER_ENABLE_RESTRICTED_BACKENDS=1 after reviewing its license."
        )
    effective_allowed = allowed_env or settings.runtime_flags.allowed_restricted_backends
    if not has_backend_consent(backend_id, allowed_env=effective_allowed):
        raise RestrictedBackendError(
            f"Backend {backend_id!r} requires recorded consent. Run `ser configure` "
            "or set SER_ALLOWED_RESTRICTED_BACKENDS."
        )


__all__ = [
    "BackendPolicy",
    "RESTRICTED_BACKEND_POLICIES",
    "RestrictedBackendError",
    "build_provenance_metadata",
    "ensure_backend_access",
    "has_backend_consent",
    "persist_all_restricted_backend_consents",
    "record_backend_consent",
]
