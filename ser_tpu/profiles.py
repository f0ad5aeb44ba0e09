"""Runtime profile catalog: YAML-backed, validated, immutable.

Parity surface: reference ``ser/profiles.py`` (catalog dataclasses, strict YAML
validation at ``:563-661``, profile precedence at ``:686-693``). Differences by
design: env-var override names are derived from the profile name instead of
being listed in YAML, and each profile carries JAX device/dtype feature-runtime
selectors instead of torch ones.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import lru_cache
from pathlib import Path
from typing import Literal

import yaml

type ProfileName = Literal["fast", "medium", "accurate", "accurate-research"]
type TranscriptionBackendId = Literal["jax_whisper", "stable_whisper", "faster_whisper"]

PROFILE_NAMES: tuple[ProfileName, ...] = ("fast", "medium", "accurate", "accurate-research")

#: Precedence used when several profile flags are active simultaneously
#: (reference ser/profiles.py:686-693): accurate-research > accurate > medium > fast.
PROFILE_PRECEDENCE: tuple[ProfileName, ...] = (
    "accurate-research",
    "accurate",
    "medium",
    "fast",
)

_CATALOG_PATH = Path(__file__).parent / "profile_defs.yaml"
_RUNTIME_KNOBS: tuple[str, ...] = (
    "timeout_seconds",
    "max_timeout_retries",
    "max_transient_retries",
    "retry_backoff_seconds",
    "pool_window_size_seconds",
    "pool_window_stride_seconds",
    "post_smoothing_window_frames",
    "post_hysteresis_enter_confidence",
    "post_hysteresis_exit_confidence",
    "post_min_segment_duration_seconds",
    "process_isolation",
)
_TRANSCRIPTION_ENV: dict[str, str] = {
    "backend_id": "WHISPER_BACKEND",
    "model_name": "WHISPER_MODEL",
    "use_demucs": "WHISPER_DEMUCS",
    "use_vad": "WHISPER_VAD",
}


class ProfileCatalogError(ValueError):
    """Raised when the profile catalog fails validation."""


def _env_prefix(profile: ProfileName) -> str:
    """Returns the SER_* env prefix for one profile (e.g. SER_ACCURATE_RESEARCH)."""
    return "SER_" + profile.upper().replace("-", "_")


@dataclass(frozen=True)
class ProfileRuntimeDefaults:
    """Execution budgets and postprocessing defaults for one profile."""

    timeout_seconds: float
    max_timeout_retries: int
    max_transient_retries: int
    retry_backoff_seconds: float
    pool_window_size_seconds: float
    pool_window_stride_seconds: float
    post_smoothing_window_frames: int
    post_hysteresis_enter_confidence: float
    post_hysteresis_exit_confidence: float
    post_min_segment_duration_seconds: float
    process_isolation: bool


@dataclass(frozen=True)
class ProfileTranscriptionDefaults:
    """Default transcription backend selection for one profile."""

    backend_id: TranscriptionBackendId
    model_name: str
    use_demucs: bool
    use_vad: bool


@dataclass(frozen=True)
class ProfileModelSpec:
    """Foundation-model selection for one profile."""

    default_model_id: str | None
    env_var: str | None


@dataclass(frozen=True)
class ProfileFeatureRuntimeDefaults:
    """JAX device/dtype selectors for one profile's feature backend."""

    device: str = "auto"
    dtype: str = "float32"


@dataclass(frozen=True)
class ProfileSpec:
    """One validated catalog entry."""

    name: ProfileName
    description: str
    backend_id: str
    required_modules: tuple[str, ...]
    enable_flag: str | None
    enabled_by_default: bool
    model: ProfileModelSpec
    feature_runtime_defaults: ProfileFeatureRuntimeDefaults
    transcription_defaults: ProfileTranscriptionDefaults
    runtime_defaults: ProfileRuntimeDefaults
    runtime_env: dict[str, str]
    transcription_env: dict[str, str]


def _require(mapping: dict, key: str, kind: type, where: str):
    if key not in mapping:
        raise ProfileCatalogError(f"Missing key {key!r} in {where}.")
    value = mapping[key]
    if kind is float and isinstance(value, int) and not isinstance(value, bool):
        value = float(value)
    if not isinstance(value, kind):
        raise ProfileCatalogError(
            f"Key {key!r} in {where} must be {kind.__name__}, got {type(value).__name__}."
        )
    return value


def _parse_runtime_defaults(raw: dict, where: str) -> ProfileRuntimeDefaults:
    parsed = {}
    for knob in _RUNTIME_KNOBS:
        if knob == "process_isolation":
            parsed[knob] = _require(raw, knob, bool, where)
        elif knob in ("max_timeout_retries", "max_transient_retries", "post_smoothing_window_frames"):
            value = _require(raw, knob, int, where)
            if isinstance(value, bool):
                # bool subclasses int: YAML `no`/`yes` must not validate as 0/1.
                raise ProfileCatalogError(f"{where}.{knob} must be an integer, not a boolean.")
            if value < 0:
                raise ProfileCatalogError(f"{where}.{knob} must be >= 0.")
            parsed[knob] = value
        else:
            value = _require(raw, knob, float, where)
            if value < 0.0:
                raise ProfileCatalogError(f"{where}.{knob} must be >= 0.")
            if knob in ("pool_window_size_seconds", "pool_window_stride_seconds") and value <= 0.0:
                # Zero-size/stride windows fail at runtime inside every
                # inference; reject at catalog load where validation lives.
                raise ProfileCatalogError(f"{where}.{knob} must be > 0.")
            parsed[knob] = value
    if parsed["post_hysteresis_enter_confidence"] < parsed["post_hysteresis_exit_confidence"]:
        raise ProfileCatalogError(f"{where}: hysteresis enter must be >= exit confidence.")
    return ProfileRuntimeDefaults(**parsed)


def _validated_tx_backend(value: str, where: str) -> str:
    allowed = ("jax_whisper", "stable_whisper", "faster_whisper")
    if value not in allowed:
        raise ProfileCatalogError(
            f"{where}.backend_id {value!r} is not one of {allowed}."
        )
    return value


def _parse_profile(name: str, raw: dict) -> ProfileSpec:
    if name not in PROFILE_NAMES:
        raise ProfileCatalogError(f"Unknown profile name {name!r} in catalog.")
    where = f"profiles.{name}"
    model_raw = _require(raw, "model", dict, where)
    default_model_id = model_raw.get("default_model_id")
    if default_model_id is not None and not isinstance(default_model_id, str):
        raise ProfileCatalogError(f"{where}.model.default_model_id must be str or null.")
    tx_raw = _require(raw, "transcription_defaults", dict, where)
    fr_raw = raw.get("feature_runtime_defaults", {})
    if not isinstance(fr_raw, dict):
        raise ProfileCatalogError(f"{where}.feature_runtime_defaults must be a mapping.")
    unknown_fr = set(fr_raw) - {"device", "dtype"}
    if unknown_fr:
        raise ProfileCatalogError(
            f"{where}.feature_runtime_defaults has unknown key(s): {sorted(unknown_fr)}."
        )
    modules = _require(raw, "required_modules", list, where)
    if not all(isinstance(module, str) for module in modules):
        raise ProfileCatalogError(f"{where}.required_modules must be a list of strings.")
    prefix = _env_prefix(name)  # type: ignore[arg-type]
    runtime_env = {knob: f"{prefix}_{knob.upper()}" for knob in _RUNTIME_KNOBS}
    return ProfileSpec(
        name=name,  # type: ignore[arg-type]
        description=_require(raw, "description", str, where),
        backend_id=_require(raw, "backend_id", str, where),
        required_modules=tuple(modules),
        enable_flag=None if name == "fast" else f"SER_ENABLE_{name.upper().replace('-', '_')}_PROFILE",
        enabled_by_default=_require(raw, "enabled_by_default", bool, where),
        model=ProfileModelSpec(
            default_model_id=default_model_id,
            env_var=None if default_model_id is None else f"{prefix}_MODEL_ID",
        ),
        feature_runtime_defaults=ProfileFeatureRuntimeDefaults(
            device=str(fr_raw.get("device", "auto")),
            dtype=str(fr_raw.get("dtype", "float32")),
        ),
        transcription_defaults=ProfileTranscriptionDefaults(
            backend_id=_validated_tx_backend(
                _require(tx_raw, "backend_id", str, f"{where}.transcription_defaults"),
                f"{where}.transcription_defaults",
            ),
            model_name=_require(tx_raw, "model_name", str, f"{where}.transcription_defaults"),
            use_demucs=_require(tx_raw, "use_demucs", bool, f"{where}.transcription_defaults"),
            use_vad=_require(tx_raw, "use_vad", bool, f"{where}.transcription_defaults"),
        ),
        runtime_defaults=_parse_runtime_defaults(
            _require(raw, "runtime_defaults", dict, where), f"{where}.runtime_defaults"
        ),
        runtime_env=runtime_env,
        transcription_env=dict(_TRANSCRIPTION_ENV),
    )


@lru_cache(maxsize=1)
def get_profile_catalog() -> dict[ProfileName, ProfileSpec]:
    """Loads, validates, and caches the profile catalog."""
    raw = yaml.safe_load(_CATALOG_PATH.read_text(encoding="utf-8"))
    if not isinstance(raw, dict):
        raise ProfileCatalogError("Profile catalog root must be a mapping.")
    if raw.get("schema_version") != 1:
        raise ProfileCatalogError("Profile catalog schema_version must be 1.")
    profiles_raw = _require(raw, "profiles", dict, "catalog")
    unknown = set(profiles_raw) - set(PROFILE_NAMES)
    if unknown:
        # A misspelled profile block would otherwise be silently dropped —
        # edits appearing accepted but never taking effect.
        raise ProfileCatalogError(f"Unknown profile entr(ies) in catalog: {sorted(unknown)}.")
    catalog: dict[ProfileName, ProfileSpec] = {}
    for name in PROFILE_NAMES:
        if name not in profiles_raw:
            raise ProfileCatalogError(f"Profile catalog missing required profile {name!r}.")
        catalog[name] = _parse_profile(name, profiles_raw[name])
    return catalog


def list_profile_names() -> tuple[ProfileName, ...]:
    """Returns all registered profile names in catalog order."""
    return PROFILE_NAMES


def resolve_profile_name(
    *,
    medium_profile: bool,
    accurate_profile: bool,
    accurate_research_profile: bool,
) -> ProfileName:
    """Resolves the active profile name from runtime flags using precedence.

    Precedence (reference ser/profiles.py:686-693):
    accurate-research > accurate > medium > fast.
    """
    active = {
        "accurate-research": accurate_research_profile,
        "accurate": accurate_profile,
        "medium": medium_profile,
        "fast": True,
    }
    # Driven by the exported precedence constant so the two cannot drift.
    for name in PROFILE_PRECEDENCE:
        if active.get(name, False):
            return name
    return "fast"


# --- Reference-named public surface (reference ser/profiles.py:17-53,681-698) ---

type ProfileEnableFlag = Literal[
    "SER_ENABLE_MEDIUM_PROFILE",
    "SER_ENABLE_ACCURATE_PROFILE",
    "SER_ENABLE_ACCURATE_RESEARCH_PROFILE",
]

#: Reference aliases: the catalog entry/model types under their public names.
ProfileCatalogEntry = ProfileSpec
ProfileModelDefinition = ProfileModelSpec


@dataclass(frozen=True)
class RuntimeProfile:
    """Resolved runtime profile configuration (reference ``profiles.py:44-53``)."""

    name: ProfileName
    description: str


def available_profiles() -> dict[str, RuntimeProfile]:
    """Immutable runtime profile definitions (reference ``profiles.py:681-683``)."""
    return {
        name: RuntimeProfile(name=name, description=entry.description)
        for name, entry in get_profile_catalog().items()
    }


def resolve_profile(settings: object) -> RuntimeProfile:
    """Resolves the full profile definition from runtime flags
    (reference ``profiles.py:696-698``)."""
    flags = getattr(settings, "runtime_flags", None)
    name = resolve_profile_name(
        medium_profile=bool(getattr(flags, "medium_profile", False)),
        accurate_profile=bool(getattr(flags, "accurate_profile", False)),
        accurate_research_profile=bool(
            getattr(flags, "accurate_research_profile", False)
        ),
    )
    return available_profiles()[name]


__all__ = [
    "PROFILE_NAMES",
    "PROFILE_PRECEDENCE",
    "ProfileCatalogEntry",
    "ProfileCatalogError",
    "ProfileEnableFlag",
    "ProfileFeatureRuntimeDefaults",
    "ProfileModelDefinition",
    "ProfileModelSpec",
    "ProfileName",
    "ProfileRuntimeDefaults",
    "ProfileSpec",
    "ProfileTranscriptionDefaults",
    "RuntimeProfile",
    "TranscriptionBackendId",
    "available_profiles",
    "get_profile_catalog",
    "list_profile_names",
    "resolve_profile",
    "resolve_profile_name",
]
