"""Profile→backend capability resolution.

Parity surface: reference ``ser/_internal/runtime/registry.py:54-119`` —
``RuntimeCapability`` reports module availability for the catalog's
``required_modules`` plus hook presence; ``ensure_profile_supported`` raises a
typed error used by the CLI for exit-code classification.
"""

from __future__ import annotations

import importlib.util
from dataclasses import dataclass, field

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu.profiles import ProfileName, get_profile_catalog


class UnsupportedProfileError(RuntimeError):
    """Raised when a requested profile cannot run in this environment."""


@dataclass(frozen=True)
class RuntimeCapability:
    """Availability verdict for one profile in the current environment."""

    profile: ProfileName
    backend_id: str
    available: bool
    missing_modules: tuple[str, ...] = field(default_factory=tuple)
    message: str = ""


def _module_available(name: str) -> bool:
    try:
        return importlib.util.find_spec(name) is not None
    except (ImportError, ValueError):
        return False


def resolve_runtime_capability(
    profile: ProfileName,
    *,
    settings: AppConfig | None = None,
    available_hooks: frozenset[str] | None = None,
) -> RuntimeCapability:
    """Resolves availability for one profile from modules + hook registry.

    ``settings`` currently informs nothing here: consent/enable gating
    happens where hooks are BUILT (``backend_hooks.build_backend_hooks``),
    so an absent hook already reflects settings-level gating. The parameter
    stays for signature stability with the reference seam.
    """
    spec = get_profile_catalog()[profile]
    missing = tuple(m for m in spec.required_modules if not _module_available(m))
    if missing:
        return RuntimeCapability(
            profile=profile,
            backend_id=spec.backend_id,
            available=False,
            missing_modules=missing,
            message=f"Profile {profile!r} requires missing modules: {', '.join(missing)}.",
        )
    if available_hooks is not None and spec.backend_id not in available_hooks:
        return RuntimeCapability(
            profile=profile,
            backend_id=spec.backend_id,
            available=False,
            message=(
                f"Profile {profile!r} backend {spec.backend_id!r} has no registered "
                "hook (disabled flag, missing consent, or unavailable runtime)."
            ),
        )
    return RuntimeCapability(profile=profile, backend_id=spec.backend_id, available=True)


def ensure_profile_supported(capability: RuntimeCapability) -> None:
    """Raises ``UnsupportedProfileError`` when the capability is unavailable."""
    if not capability.available:
        raise UnsupportedProfileError(capability.message or f"Profile {capability.profile!r} unavailable.")


__all__ = [
    "RuntimeCapability",
    "UnsupportedProfileError",
    "ensure_profile_supported",
    "resolve_runtime_capability",
]
