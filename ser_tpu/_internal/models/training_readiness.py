"""Pre-training readiness: findings, quarantine budgets, prepared plans.

Parity surface (staged v1 of the reference's largest module,
``ser/_internal/models/training_readiness.py``):

- failure taxonomy with scope/severity/reason (reference ``:107-170``),
- config/media/split findings (``:975,1226,1388,1649``),
- quarantine budgets (absolute, per-class, min-remaining; ``:207-292``),
- digest-canonicalized ``PreparedPlan`` with normalized-PCM sample digests
  (``:431-480,517-567``) enabling ``--prepare-only`` / ``--prepared-plan``
  resume (``training_orchestration.py:842-976``).
"""

from __future__ import annotations

import dataclasses
import json
from collections import Counter
from dataclasses import dataclass
from enum import Enum
from hashlib import sha256
from pathlib import Path

import numpy as np

from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.data import loader
from ser_tpu._internal.data.manifest import normalized_pcm_sha256
from ser_tpu._internal.utils.audio_io import read_audio_file
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.profiles import ProfileName

logger = get_logger(__name__)

PLAN_SCHEMA_VERSION = 1


class FindingScope(str, Enum):
    CONFIG = "config"
    MEDIA = "media"
    SPLIT = "split"
    RESOURCE = "resource"


class FindingSeverity(str, Enum):
    INFO = "info"
    WARNING = "warning"
    BLOCKING = "blocking"


@dataclass(frozen=True)
class ReadinessFinding:
    """One readiness check outcome."""

    scope: FindingScope
    severity: FindingSeverity
    reason: str
    message: str
    sample_id: str | None = None


@dataclass(frozen=True)
class ReadinessReport:
    """All findings + the quarantine decision for one readiness run."""

    profile: ProfileName
    findings: tuple[ReadinessFinding, ...]
    quarantined_files: tuple[str, ...]
    usable_files: tuple[str, ...]

    @property
    def blocking(self) -> bool:
        return any(f.severity is FindingSeverity.BLOCKING for f in self.findings)


def _config_findings(settings: AppConfig) -> list[ReadinessFinding]:
    findings = []
    folder = settings.dataset.folder
    if not folder.exists():
        findings.append(
            ReadinessFinding(
                FindingScope.CONFIG,
                FindingSeverity.BLOCKING,
                "dataset_folder_missing",
                f"Dataset folder does not exist: {folder}",
            )
        )
    if settings.training.test_size <= 0 or settings.training.test_size >= 1:
        findings.append(
            ReadinessFinding(
                FindingScope.CONFIG,
                FindingSeverity.BLOCKING,
                "invalid_test_size",
                f"training.test_size must be in (0,1); got {settings.training.test_size}.",
            )
        )
    return findings


def _media_findings(
    files: list[str], settings: AppConfig
) -> tuple[list[ReadinessFinding], list[str], list[str]]:
    """Probes each file's decodability; applies quarantine budgets."""
    findings: list[ReadinessFinding] = []
    quarantined: list[str] = []
    usable: list[str] = []
    per_reason: Counter[str] = Counter()
    for file in files:
        try:
            audio, sr = read_audio_file(
                file,
                audio_read_config=dataclasses.replace(
                    settings.audio_read, max_retries=1, retry_delay_seconds=0.0
                ),
            )
            if audio.size < int(0.1 * sr):
                raise ValueError("clip shorter than 100 ms")
            usable.append(file)
        except Exception as err:  # noqa: BLE001 - every defect becomes a finding
            reason = type(err).__name__
            per_reason[reason] += 1
            quarantined.append(file)
            findings.append(
                ReadinessFinding(
                    FindingScope.MEDIA,
                    FindingSeverity.WARNING,
                    f"undecodable:{reason}",
                    f"{file}: {err}",
                    sample_id=Path(file).stem,
                )
            )

    budget = settings.data_loader
    total = len(files)
    if total:
        if len(quarantined) > budget.max_failed_files:
            findings.append(
                ReadinessFinding(
                    FindingScope.MEDIA,
                    FindingSeverity.BLOCKING,
                    "quarantine_budget_absolute",
                    f"{len(quarantined)} quarantined files exceed the absolute budget "
                    f"({budget.max_failed_files}).",
                )
            )
        elif len(quarantined) / total > budget.max_failed_file_ratio:
            findings.append(
                ReadinessFinding(
                    FindingScope.MEDIA,
                    FindingSeverity.BLOCKING,
                    "quarantine_budget_ratio",
                    f"Failure ratio {len(quarantined) / total:.1%} exceeds "
                    f"{budget.max_failed_file_ratio:.1%}.",
                )
            )
        for reason, count in per_reason.items():
            if count > budget.max_failures_per_reason:
                findings.append(
                    ReadinessFinding(
                        FindingScope.MEDIA,
                        FindingSeverity.BLOCKING,
                        "quarantine_budget_per_reason",
                        f"{count} failures of kind {reason} exceed per-reason budget "
                        f"({budget.max_failures_per_reason}).",
                    )
                )
    return findings, quarantined, usable


def _split_findings(usable: list[str], settings: AppConfig) -> list[ReadinessFinding]:
    findings = []
    emotion_map = dict(settings.emotions)
    labels = [
        emotion_map.get(loader.extract_ravdess_emotion_code(Path(f).name) or "")
        for f in usable
    ]
    labeled = [label for label in labels if label is not None]
    counts = Counter(labeled)
    if len(counts) < 2:
        findings.append(
            ReadinessFinding(
                FindingScope.SPLIT,
                FindingSeverity.BLOCKING,
                "insufficient_classes",
                f"Need >= 2 emotion classes; found {sorted(counts)}.",
            )
        )
    floor = settings.data_loader.min_remaining_per_class_split
    for label, count in sorted(counts.items()):
        if count < max(2, floor + 1):
            findings.append(
                ReadinessFinding(
                    FindingScope.SPLIT,
                    FindingSeverity.WARNING,
                    "class_floor",
                    f"Class {label!r} has only {count} usable clips.",
                )
            )
    speakers = {
        loader.extract_ravdess_speaker_id_from_path(f) or Path(f).stem for f in usable
    }
    if len(speakers) < 2:
        findings.append(
            ReadinessFinding(
                FindingScope.SPLIT,
                FindingSeverity.WARNING,
                "single_speaker",
                "Fewer than 2 speakers; speaker-disjoint evaluation degenerates.",
            )
        )
    return findings


def run_training_readiness(
    *, settings: AppConfig, profile: ProfileName
) -> ReadinessReport:
    """Runs the full readiness contract for one profile."""
    findings = _config_findings(settings)
    if any(f.severity is FindingSeverity.BLOCKING for f in findings):
        return ReadinessReport(profile, tuple(findings), (), ())
    files = loader.discover_dataset_files(settings)
    if not files:
        findings.append(
            ReadinessFinding(
                FindingScope.CONFIG,
                FindingSeverity.BLOCKING,
                "no_dataset_files",
                f"No files matched {settings.dataset.glob_pattern}.",
            )
        )
        return ReadinessReport(profile, tuple(findings), (), ())
    media, quarantined, usable = _media_findings(files, settings)
    findings.extend(media)
    findings.extend(_split_findings(usable, settings))
    findings.extend(_recipe_findings(settings))
    return ReadinessReport(profile, tuple(findings), tuple(quarantined), tuple(usable))


def _recipe_findings(settings: AppConfig) -> list[ReadinessFinding]:
    """Audits the configured cross-corpus recipe when one is set."""
    if not settings.dataset.recipe:
        return []
    from ser_tpu._internal.data.recipe import audit_recipe, get_recipe

    try:
        recipe = get_recipe(settings.dataset.recipe)
    except KeyError as err:
        return [
            ReadinessFinding(
                FindingScope.CONFIG,
                FindingSeverity.BLOCKING,
                "unknown_recipe",
                str(err),
            )
        ]
    utterances = loader.load_utterances(settings=settings)
    if not utterances:
        return [
            ReadinessFinding(
                FindingScope.CONFIG,
                FindingSeverity.BLOCKING,
                "recipe_no_utterances",
                "Recipe configured but no utterances loaded.",
            )
        ]
    report = audit_recipe(utterances, recipe, strict=settings.dataset.strict_audit)
    return [
        ReadinessFinding(
            FindingScope.CONFIG,
            FindingSeverity.BLOCKING if issue.blocking else FindingSeverity.WARNING,
            f"recipe:{issue.kind}",
            issue.message,
        )
        for issue in report.issues
    ]


# --------------------------------------------------------------------------- #
# Prepared plans (digest-signed resume)
# --------------------------------------------------------------------------- #


def _settings_digest(settings: AppConfig, profile: ProfileName) -> str:
    payload = json.dumps(
        {
            "profile": profile,
            "feature_flags": dataclasses.asdict(settings.feature_flags),
            "nn": dataclasses.asdict(settings.nn),
            "training": dataclasses.asdict(settings.training),
            "emotions": dict(settings.emotions),
        },
        sort_keys=True,
        default=str,
    )
    return sha256(payload.encode("utf-8")).hexdigest()


def write_prepared_plan(
    *,
    settings: AppConfig,
    profile: ProfileName,
    report: ReadinessReport,
    plan_dir: Path,
) -> Path:
    """Extracts features for usable files and writes a digest-signed plan."""
    from ser_tpu.ops.features import extract_feature_vectors_batch

    plan_dir.mkdir(parents=True, exist_ok=True)
    emotion_map = dict(settings.emotions)
    clips, labels, digests, kept_files = [], [], [], []
    for file in report.usable_files:
        label = emotion_map.get(loader.extract_ravdess_emotion_code(Path(file).name) or "")
        if label is None:
            continue
        audio, sr = read_audio_file(file, audio_read_config=settings.audio_read)
        clips.append((audio, sr))
        labels.append(label)
        digests.append(normalized_pcm_sha256(audio))
        kept_files.append(file)
    if not clips:
        raise RuntimeError("No usable labeled clips to prepare.")
    features = extract_feature_vectors_batch(clips, feature_flags=settings.feature_flags)

    payload_path = plan_dir / "prepared_features.npz"
    np.savez_compressed(
        payload_path, features=features, labels=np.asarray(labels, dtype=object)
    )
    plan = {
        "plan_schema_version": PLAN_SCHEMA_VERSION,
        "profile": profile,
        "settings_digest": _settings_digest(settings, profile),
        "quarantine_ledger_digest": quarantine_ledger_digest(settings, profile),
        "files": kept_files,
        "sample_digests": digests,
        "payload": str(payload_path),
        "feature_dim": int(features.shape[1]),
    }
    plan_path = plan_dir / "prepared_plan.json"
    plan_path.write_text(json.dumps(plan, indent=2), encoding="utf-8")
    return plan_path


def write_quarantine_ledger(
    report: ReadinessReport, *, settings: AppConfig
) -> Path | None:
    """Appends quarantine records to the profile's JSONL ledger.

    Parity surface: reference quarantine ledgers
    (``training_readiness.py:704-864``, ``docs/training-readiness.md:50-60``) —
    every excluded sample is recorded with scope/reason/message so exclusions
    are auditable and stable across prepare/train reruns.
    """
    if not report.quarantined_files:
        return None
    ledger_dir = settings.tmp_folder / "quarantine"
    ledger_dir.mkdir(parents=True, exist_ok=True)
    ledger_path = ledger_dir / f"{report.profile}.jsonl"
    media_findings = {
        finding.sample_id: finding
        for finding in report.findings
        if finding.scope is FindingScope.MEDIA and finding.sample_id
    }
    import time as _time

    with ledger_path.open("a", encoding="utf-8") as handle:
        for file in report.quarantined_files:
            finding = media_findings.get(Path(file).stem)
            handle.write(
                json.dumps(
                    {
                        "file": file,
                        "scope": "media",
                        "reason": finding.reason if finding else "unknown",
                        "message": finding.message if finding else "",
                        "recorded_at_unix": _time.time(),
                    }
                )
                + "\n"
            )
    return ledger_path


def quarantine_ledger_digest(settings: AppConfig, profile: ProfileName) -> str | None:
    """Content digest of the profile's quarantine ledger (None when absent)."""
    ledger_path = settings.tmp_folder / "quarantine" / f"{profile}.jsonl"
    if not ledger_path.exists():
        return None
    return sha256(ledger_path.read_bytes()).hexdigest()


class PreparedPlanError(ValueError):
    """Raised when a prepared plan fails digest validation."""


def load_prepared_plan(
    plan_path: Path, *, settings: AppConfig, profile: ProfileName
) -> tuple[np.ndarray, list[str]]:
    """Validates a prepared plan's digests and returns (features, labels)."""
    plan = json.loads(Path(plan_path).read_text(encoding="utf-8"))
    if plan.get("plan_schema_version") != PLAN_SCHEMA_VERSION:
        raise PreparedPlanError("Unsupported prepared-plan schema version.")
    if plan.get("profile") != profile:
        raise PreparedPlanError(
            f"Plan was prepared for profile {plan.get('profile')!r}, not {profile!r}."
        )
    if plan.get("settings_digest") != _settings_digest(settings, profile):
        raise PreparedPlanError(
            "Prepared plan settings digest mismatch: training configuration changed "
            "since preparation. Re-run --prepare-only."
        )
    if plan.get("quarantine_ledger_digest") != quarantine_ledger_digest(settings, profile):
        raise PreparedPlanError(
            "Prepared plan quarantine-ledger digest mismatch: exclusions changed "
            "since preparation. Re-run --prepare-only."
        )
    with np.load(plan["payload"], allow_pickle=True) as payload:
        features = payload["features"]
        labels = [str(label) for label in payload["labels"]]
    if features.shape[0] != len(plan["sample_digests"]):
        raise PreparedPlanError("Prepared payload row count does not match plan digests.")
    return features, labels


def run_training_repair(*, settings: AppConfig, profile: ProfileName) -> int:
    """Reduced repair flow (reference repair allowlist, ``:1893-2143``):
    purge stale embedding caches + prepared plans, then re-run readiness.
    Network-gated repairs (pinned-model redownload) are unavailable in this
    zero-egress runtime and reported as such."""
    import shutil

    purged = []
    for target in (
        settings.tmp_folder / "embedding-cache",
        settings.tmp_folder / "prepared",
    ):
        if target.exists():
            shutil.rmtree(target, ignore_errors=True)
            purged.append(str(target))
    for path in purged:
        print(f"repair: purged {path}")
    print(
        "repair: pinned-model redownload requires network access and is "
        "unavailable in this runtime (stage checkpoints manually)."
    )
    report = run_training_readiness(settings=settings, profile=profile)
    print(
        f"repair: post-repair readiness usable={len(report.usable_files)} "
        f"quarantined={len(report.quarantined_files)} blocking={report.blocking}"
    )
    return 2 if report.blocking else 0


def run_training_readiness_cli(
    *,
    settings: AppConfig,
    profile: ProfileName,
    dry_run: bool,
    prepare_only: bool,
    prepared_plan: str | None,
) -> int:
    """CLI entry for --dry-run / --prepare-only / --prepared-plan flows."""
    if prepared_plan:
        from ser_tpu._internal.models.fast_training import train_from_prepared

        try:
            report = train_from_prepared(
                plan_path=Path(prepared_plan), settings=settings, profile=profile
            )
        except PreparedPlanError as err:
            logger.error("%s", err)
            return 2
        print(f"Trained from prepared plan: accuracy={report['accuracy']:.3f}")
        return 0

    report = run_training_readiness(settings=settings, profile=profile)
    ledger = write_quarantine_ledger(report, settings=settings)
    if ledger is not None:
        print(f"quarantine ledger: {ledger}")
    for finding in report.findings:
        print(f"[{finding.severity.value:>8}] {finding.scope.value}/{finding.reason}: {finding.message}")
    print(
        f"usable={len(report.usable_files)} quarantined={len(report.quarantined_files)} "
        f"blocking={report.blocking}"
    )
    if report.blocking:
        return 2
    if prepare_only:
        plan_dir = settings.tmp_folder / "prepared" / profile
        plan_path = write_prepared_plan(
            settings=settings, profile=profile, report=report, plan_dir=plan_dir
        )
        print(f"Prepared plan written: {plan_path}")
    return 0


__all__ = [
    "FindingScope",
    "FindingSeverity",
    "PreparedPlanError",
    "ReadinessFinding",
    "ReadinessReport",
    "load_prepared_plan",
    "run_training_readiness",
    "run_training_readiness_cli",
    "write_prepared_plan",
]
