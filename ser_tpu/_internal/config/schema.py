"""Immutable configuration schema for the TPU-native SER framework.

Parity surface: reference ``ser/_internal/config/schema.py`` (frozen dataclass
catalog, catalog-driven per-profile runtime defaults at ``:392-566``, platform
cache/data dirs at ``:28-73``). TPU-first difference: ``TorchRuntimeConfig``
keeps its public name for drop-in compatibility but its device/dtype selectors
drive JAX placement ("auto" → TPU when present, else CPU; dtype "auto" → bf16
on TPU), resolved by ``ser_tpu/_internal/repr/runtime_policy.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Mapping
from dataclasses import dataclass, field, fields
from pathlib import Path
from typing import Literal

from ser_tpu._internal.config import artifact_naming
from ser_tpu.profiles import (
    ProfileRuntimeDefaults,
    TranscriptionBackendId,
    get_profile_catalog,
)

APP_NAME = "ser"
DEFAULT_FAST_MODEL_FILE_NAME = artifact_naming.FAST_MODEL_FILE_NAME
DEFAULT_FAST_SECURE_MODEL_FILE_NAME = artifact_naming.FAST_SECURE_MODEL_FILE_NAME
DEFAULT_FAST_TRAINING_REPORT_FILE_NAME = artifact_naming.FAST_TRAINING_REPORT_FILE_NAME

type ArtifactProfileName = artifact_naming.ArtifactProfileName


# --------------------------------------------------------------------------- #
# Platform-native directory resolution (reference schema.py:28-73)
# --------------------------------------------------------------------------- #


def _platform_cache_base_dir() -> Path:
    if sys.platform == "win32":
        return Path(os.getenv("LOCALAPPDATA", str(Path.home() / "AppData/Local")))
    if sys.platform == "darwin":
        return Path.home() / "Library" / "Caches"
    return Path(os.getenv("XDG_CACHE_HOME", str(Path.home() / ".cache")))


def _platform_data_base_dir() -> Path:
    if sys.platform == "win32":
        return Path(os.getenv("APPDATA", str(Path.home() / "AppData/Roaming")))
    if sys.platform == "darwin":
        return Path.home() / "Library" / "Application Support"
    return Path(os.getenv("XDG_DATA_HOME", str(Path.home() / ".local/share")))


def default_cache_root() -> Path:
    return _platform_cache_base_dir() / APP_NAME


def default_data_root() -> Path:
    return _platform_data_base_dir() / APP_NAME


def _default_tmp_folder() -> Path:
    return default_cache_root() / "tmp"


def _default_models_folder() -> Path:
    return default_data_root() / "models"


def _default_transcripts_folder() -> Path:
    return default_data_root() / "transcripts"


def _default_model_cache_root() -> Path:
    return default_cache_root() / "model-cache"


def default_profile_model_id(profile: ArtifactProfileName) -> str:
    """Returns the catalog-defined default model id for one model-backed profile."""
    model_id = get_profile_catalog()[profile].model.default_model_id
    if isinstance(model_id, str) and model_id.strip():
        return model_id.strip()
    raise RuntimeError(f"Profile {profile!r} does not define a default model id.")


def profile_artifact_file_names(
    *,
    profile: ArtifactProfileName,
    medium_model_id: str | None = None,
    accurate_model_id: str | None = None,
    accurate_research_model_id: str | None = None,
) -> tuple[str, str, str]:
    """Returns default artifact filenames for one profile/backend-model tuple."""
    return artifact_naming.profile_artifact_file_names(
        profile=profile,
        medium_model_id=medium_model_id or default_profile_model_id("medium"),
        accurate_model_id=accurate_model_id or default_profile_model_id("accurate"),
        accurate_research_model_id=(
            accurate_research_model_id or default_profile_model_id("accurate-research")
        ),
    )


# --------------------------------------------------------------------------- #
# Leaf config dataclasses
# --------------------------------------------------------------------------- #


@dataclass(frozen=True)
class FeatureFlags:
    """Handcrafted feature-group toggles (reference schema.py:219-227)."""

    mfcc: bool = True
    chroma: bool = True
    mel: bool = True
    contrast: bool = True
    tonnetz: bool = True


@dataclass(frozen=True)
class NeuralNetConfig:
    """MLP classifier head hyperparameters (reference schema.py:230-240)."""

    alpha: float = 0.01
    batch_size: int | Literal["auto"] = 256
    epsilon: float = 1e-08
    hidden_layer_sizes: tuple[int, ...] = (300,)
    learning_rate: Literal["constant", "invscaling", "adaptive"] = "adaptive"
    max_iter: int = 500
    random_state: int = 42


@dataclass(frozen=True)
class AudioReadConfig:
    """Retry behavior for audio loading (reference schema.py:243-248)."""

    max_retries: int = 3
    retry_delay_seconds: float = 1.0


@dataclass(frozen=True)
class DatasetConfig:
    """Dataset location and glob settings."""

    folder: Path
    subfolder_prefix: str = "Actor_*"
    extension: str = "*.wav"
    manifest_paths: tuple[Path, ...] = ()
    recipe: str | None = None
    strict_audit: bool = False
    #: Redirects the persisted dataset registry (tests / alternate data
    #: roots); None = the platform data root.
    registry_root: Path | None = None

    @property
    def glob_pattern(self) -> str:
        """Returns the on-disk glob pattern for dataset audio files."""
        return str(self.folder / self.subfolder_prefix / self.extension)


@dataclass(frozen=True)
class DataLoaderConfig:
    """Parallelism and failure-budget controls for dataset loading."""

    max_workers: int = 8
    max_failed_file_ratio: float = 0.01
    max_failed_files: int = 25
    max_failed_file_ratio_per_corpus: float = 0.01
    max_failed_file_ratio_per_class: float = 0.01
    max_failures_per_reason: int = 10
    min_remaining_per_class_split: int = 1
    strict_quarantine: bool = False


@dataclass(frozen=True)
class TrainingConfig:
    """Dataset split controls for model training."""

    test_size: float = 0.25
    dev_size: float = 0.10
    random_state: int = 42
    stratify_split: bool = True


@dataclass(frozen=True)
class WhisperModelConfig:
    """Transcription model selection and storage location.

    ``name`` is EMPTY unless explicitly selected (WHISPER_MODEL env): the
    per-profile catalog default resolves at transcription time
    (``resolve_transcription_profile``). A truthy fast-profile default here
    meant the accurate profile could never reach its own catalog model.
    """

    name: str = ""
    relative_path: Path = Path("OpenAI/whisper")


@dataclass(frozen=True)
class ModelsConfig:
    """Storage and runtime settings for trained artifacts and model caches."""

    folder: Path = field(default_factory=_default_models_folder)
    model_cache_dir: Path = field(default_factory=_default_model_cache_root)
    whisper_model: WhisperModelConfig = field(default_factory=WhisperModelConfig)
    medium_model_id: str = field(default_factory=lambda: default_profile_model_id("medium"))
    accurate_model_id: str = field(default_factory=lambda: default_profile_model_id("accurate"))
    accurate_research_model_id: str = field(
        default_factory=lambda: default_profile_model_id("accurate-research")
    )
    num_cores: int = 1
    model_file_name: str = DEFAULT_FAST_MODEL_FILE_NAME
    secure_model_file_name: str = DEFAULT_FAST_SECURE_MODEL_FILE_NAME
    training_report_file_name: str = DEFAULT_FAST_TRAINING_REPORT_FILE_NAME

    @property
    def model_file(self) -> Path:
        return self.folder / self.model_file_name

    @property
    def secure_model_file(self) -> Path:
        return self.folder / self.secure_model_file_name

    @property
    def training_report_file(self) -> Path:
        return self.folder / self.training_report_file_name

    @property
    def whisper_download_root(self) -> Path:
        return self.model_cache_dir / self.whisper_model.relative_path

    @property
    def huggingface_cache_root(self) -> Path:
        return self.model_cache_dir / "huggingface"

    @property
    def modelscope_cache_root(self) -> Path:
        """ModelScope hub cache for the emotion2vec/FunASR family (reference
        ``config/schema.py:338-341``)."""
        return self.model_cache_dir / "modelscope" / "hub"

    @property
    def orbax_checkpoint_root(self) -> Path:
        """Root for orbax-persisted JAX encoder/head checkpoints (TPU-native addition)."""
        return self.model_cache_dir / "orbax"


@dataclass(frozen=True)
class TimelineConfig:
    """Output settings for transcript timeline exports."""

    folder: Path = field(default_factory=_default_transcripts_folder)


@dataclass(frozen=True)
class TranscriptionConfig:
    """Runtime controls for transcription behavior.

    The reference carries MPS admission-control knobs (schema.py:369-377); the
    TPU build replaces them with HBM admission controls of the same shape.
    """

    backend_id: TranscriptionBackendId = field(
        default_factory=lambda: get_profile_catalog()["fast"].transcription_defaults.backend_id
    )
    use_demucs: bool = field(
        default_factory=lambda: get_profile_catalog()["fast"].transcription_defaults.use_demucs
    )
    use_vad: bool = field(
        default_factory=lambda: get_profile_catalog()["fast"].transcription_defaults.use_vad
    )
    # Greedy is the TPU-latency default; "beam" matches the reference quality
    # lane (its faster-whisper adapter decodes at beam_size=5,
    # reference transcript/backends/faster_whisper.py:263).
    decode_strategy: Literal["greedy", "beam"] = "greedy"
    beam_size: int = 5
    length_penalty: float = 1.0
    hbm_admission_control_enabled: bool = True
    #: Hard device OOMs fail over to CPU immediately instead of burning the
    #: transient retry ladder (reference mps_hard_oom_shortcut_enabled,
    #: schema.py parity; default on).
    hbm_hard_oom_shortcut_enabled: bool = True
    hbm_admission_min_headroom_mb: float = 256.0
    hbm_admission_safety_margin_mb: float = 256.0
    calibration_overrides_enabled: bool = True
    calibration_min_confidence: Literal["high", "medium", "low"] = "high"
    calibration_report_max_age_hours: float = 168.0
    calibration_report_path: Path | None = None
    # Locally staged neural-separator checkpoint (.npz) for the use_demucs
    # lane; None keeps the weight-free REPET-SIM separator.
    separation_model_path: Path | None = None
    # No bundled backend *requires* isolation (the reference isolated only
    # ctranslate2/faster_whisper for a macOS OpenMP clash, process_isolation
    # .py:319-321); the spawn path stays available as an opt-in for CPU runs.
    process_isolation: bool = False
    isolation_timeout_seconds: float = 600.0


@dataclass(frozen=True)
class RuntimeFlags:
    """Feature flags for staged runtime rollout (reference schema.py:380-389)."""

    profile_pipeline: bool = False
    medium_profile: bool = False
    accurate_profile: bool = False
    accurate_research_profile: bool = False
    restricted_backends: bool = False
    #: SER_ALLOWED_RESTRICTED_BACKENDS: per-backend env allowlist honored as
    #: an alternative to the persisted consent store.
    allowed_restricted_backends: tuple[str, ...] = ()
    new_output_schema: bool = False


@dataclass(frozen=True)
class ProfileRuntimeConfig:
    """Execution budgets and postprocessing controls for one runtime profile."""

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


def _catalog_defaults(profile: ArtifactProfileName) -> ProfileRuntimeDefaults:
    return get_profile_catalog()[profile].runtime_defaults


def _runtime_config_kwargs(profile: ArtifactProfileName) -> dict[str, object]:
    defaults = _catalog_defaults(profile)
    return {f.name: getattr(defaults, f.name) for f in fields(ProfileRuntimeConfig)}


def _make_profile_runtime_config_class(profile: ArtifactProfileName, class_name: str):
    """Builds a ProfileRuntimeConfig subclass with catalog-backed field defaults.

    Equivalent to the reference's per-profile config classes
    (schema.py:409-566) without 4x duplicated field-factory boilerplate.
    """
    namespace = {
        "__doc__": f"Execution budgets and retry controls for the {profile} profile.",
        "__annotations__": {f.name: f.type for f in fields(ProfileRuntimeConfig)},
        "__module__": __name__,
    }
    for f in fields(ProfileRuntimeConfig):
        namespace[f.name] = field(
            default_factory=(lambda p=profile, n=f.name: getattr(_catalog_defaults(p), n))
        )
    return dataclass(frozen=True)(type(class_name, (ProfileRuntimeConfig,), namespace))


FastRuntimeConfig = _make_profile_runtime_config_class("fast", "FastRuntimeConfig")
MediumRuntimeConfig = _make_profile_runtime_config_class("medium", "MediumRuntimeConfig")
AccurateRuntimeConfig = _make_profile_runtime_config_class("accurate", "AccurateRuntimeConfig")
AccurateResearchRuntimeConfig = _make_profile_runtime_config_class(
    "accurate-research", "AccurateResearchRuntimeConfig"
)


@dataclass(frozen=True)
class MediumTrainingConfig:
    """Noise-control settings for medium training dataset construction."""

    min_window_std: float = 0.0
    max_windows_per_clip: int = 0


@dataclass(frozen=True)
class QualityGateConfig:
    """Rollout thresholds for fast-versus-medium quality gates (reference schema.py:577-584)."""

    min_uar_delta: float = 0.0025
    min_macro_f1_delta: float = 0.0025
    max_medium_segments_per_minute: float = 25.0
    min_medium_median_segment_duration_seconds: float = 2.5


@dataclass(frozen=True)
class OntologyConfig:
    """Label-ontology policy knobs (reference ``label_ontology.py:12-44``).

    ``allowed_labels`` empty = derive from the configured emotion map's
    values; ``unknown_label_policy`` controls out-of-ontology labels during
    dataset preparation (drop them, abort, or fold into ``other_label``).
    """

    ontology_id: str = "default_v1"
    allowed_labels: tuple[str, ...] = ()
    unknown_label_policy: str = "drop"
    other_label: str = "other"


@dataclass(frozen=True)
class SchemaConfig:
    """Version controls for runtime and artifact schema compatibility."""

    output_schema_version: str = "v1"
    artifact_schema_version: str = "v2"


@dataclass(frozen=True)
class TorchRuntimeConfig:
    """Accelerator device/dtype selection (public name kept for parity).

    In the TPU build these selectors drive JAX placement: device "auto" picks
    TPU when available else CPU; dtype "auto" resolves per-backend (bf16 on
    TPU for transformer encoders, f32 for the handcrafted DSP path).
    """

    device: str = "auto"
    dtype: str = "auto"
    enable_mps_fallback: bool = False


#: TPU-native alias for the accelerator runtime selector.
AcceleratorRuntimeConfig = TorchRuntimeConfig


@dataclass(frozen=True)
class FeatureRuntimeBackendOverride:
    """Backend-scoped device/dtype override used by feature policy resolution."""

    device: str | None = None
    dtype: str | None = None


@dataclass(frozen=True)
class FeatureRuntimePolicyConfig:
    """Optional backend-specific runtime selector overrides."""

    backend_overrides: tuple[tuple[str, FeatureRuntimeBackendOverride], ...] = ()

    def for_backend(self, backend_id: str) -> FeatureRuntimeBackendOverride | None:
        """Returns one backend override when present."""
        normalized = backend_id.strip().lower()
        if not normalized:
            return None
        for candidate, override in self.backend_overrides:
            if candidate == normalized:
                return override
        return None


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for multi-chip execution (TPU-native addition).

    Axis sizes of 0 mean "infer from the available device count": data
    parallelism absorbs the remainder after model axes are fixed.
    """

    data_axis_size: int = 0
    model_axis_size: int = 1
    axis_names: tuple[str, str] = ("data", "model")


@dataclass(frozen=True)
class AppConfig:
    """Immutable runtime configuration snapshot (reference schema.py:629-660)."""

    emotions: Mapping[str, str]
    tmp_folder: Path = field(default_factory=_default_tmp_folder)
    feature_flags: FeatureFlags = field(default_factory=FeatureFlags)
    nn: NeuralNetConfig = field(default_factory=NeuralNetConfig)
    audio_read: AudioReadConfig = field(default_factory=AudioReadConfig)
    dataset: DatasetConfig = field(
        default_factory=lambda: DatasetConfig(folder=default_data_root() / "dataset" / "ravdess")
    )
    data_loader: DataLoaderConfig = field(default_factory=DataLoaderConfig)
    training: TrainingConfig = field(default_factory=TrainingConfig)
    models: ModelsConfig = field(default_factory=ModelsConfig)
    timeline: TimelineConfig = field(default_factory=TimelineConfig)
    transcription: TranscriptionConfig = field(default_factory=TranscriptionConfig)
    runtime_flags: RuntimeFlags = field(default_factory=RuntimeFlags)
    fast_runtime: FastRuntimeConfig = field(default_factory=FastRuntimeConfig)
    medium_runtime: MediumRuntimeConfig = field(default_factory=MediumRuntimeConfig)
    accurate_runtime: AccurateRuntimeConfig = field(default_factory=AccurateRuntimeConfig)
    accurate_research_runtime: AccurateResearchRuntimeConfig = field(
        default_factory=AccurateResearchRuntimeConfig
    )
    medium_training: MediumTrainingConfig = field(default_factory=MediumTrainingConfig)
    quality_gate: QualityGateConfig = field(default_factory=QualityGateConfig)
    ontology: OntologyConfig = field(default_factory=OntologyConfig)
    schema: SchemaConfig = field(default_factory=SchemaConfig)
    torch_runtime: TorchRuntimeConfig = field(default_factory=TorchRuntimeConfig)
    feature_runtime_policy: FeatureRuntimePolicyConfig = field(
        default_factory=FeatureRuntimePolicyConfig
    )
    mesh: MeshConfig = field(default_factory=MeshConfig)
    default_language: str = "en"

    def profile_runtime(self, profile: ArtifactProfileName) -> ProfileRuntimeConfig:
        """Returns the runtime config for one profile name."""
        return {
            "fast": self.fast_runtime,
            "medium": self.medium_runtime,
            "accurate": self.accurate_runtime,
            "accurate-research": self.accurate_research_runtime,
        }[profile]


__all__ = [
    "APP_NAME",
    "DEFAULT_FAST_MODEL_FILE_NAME",
    "DEFAULT_FAST_SECURE_MODEL_FILE_NAME",
    "DEFAULT_FAST_TRAINING_REPORT_FILE_NAME",
    "AcceleratorRuntimeConfig",
    "AccurateResearchRuntimeConfig",
    "AccurateRuntimeConfig",
    "AppConfig",
    "ArtifactProfileName",
    "AudioReadConfig",
    "DataLoaderConfig",
    "DatasetConfig",
    "FastRuntimeConfig",
    "FeatureFlags",
    "FeatureRuntimeBackendOverride",
    "FeatureRuntimePolicyConfig",
    "MediumRuntimeConfig",
    "MediumTrainingConfig",
    "MeshConfig",
    "ModelsConfig",
    "NeuralNetConfig",
    "ProfileRuntimeConfig",
    "OntologyConfig",
    "QualityGateConfig",
    "RuntimeFlags",
    "SchemaConfig",
    "TimelineConfig",
    "TorchRuntimeConfig",
    "TrainingConfig",
    "TranscriptionConfig",
    "WhisperModelConfig",
    "default_cache_root",
    "default_data_root",
    "default_profile_model_id",
    "profile_artifact_file_names",
]
