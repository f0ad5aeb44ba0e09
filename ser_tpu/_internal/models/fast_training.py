"""Fast-profile training: batched features → JAX MLP head → artifact + report.

Parity surface: reference ``ser/_internal/models/fast_training.py`` +
``training_support.py`` — load features, split, fit the configured MLP head,
evaluate accuracy/macro-F1/UAR/per-class recall/confusion, persist the
artifact envelope and a JSON training report.
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any

import numpy as np

from ser_tpu._internal.config.bootstrap import reload_settings
from ser_tpu._internal.config.schema import AppConfig
from ser_tpu._internal.data import loader
from ser_tpu._internal.models import artifacts
from ser_tpu._internal.train.metrics import accuracy, compute_ser_metrics
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.models.mlp_head import JaxMLPClassifier
from ser_tpu.ops.features import feature_dim

logger = get_logger(__name__)


class TrainingDataError(RuntimeError):
    """Raised when training data cannot support a model fit."""


def _license_provenance(settings: AppConfig) -> dict[str, Any]:
    from ser_tpu._internal.runtime.restricted_backends import build_provenance_metadata

    return build_provenance_metadata(
        settings=settings, backend_id="handcrafted", profile="fast"
    )


def train_fast_model(*, settings: AppConfig | None = None) -> dict[str, Any]:
    """Trains the fast-profile head end-to-end; returns the training report."""
    settings = settings if settings is not None else reload_settings()
    started = time.time()

    from contextlib import nullcontext

    from ser_tpu._internal.models.training_orchestration import (
        current_training_run,
        ensure_entrypoint_readiness,
        training_operation_scope,
    )

    scope = (
        nullcontext()
        if current_training_run() is not None
        else training_operation_scope("fast")
    )
    with scope:
        ensure_entrypoint_readiness(settings=settings, profile="fast")
        return _train_fast_model_ready(settings, started)


def _train_fast_model_ready(settings: AppConfig, started: float) -> dict[str, Any]:
    split = loader.load_data(settings=settings)
    if split is None:
        raise TrainingDataError(
            "No trainable data found. Check SER_DATASET_FOLDER and dataset contents."
        )
    x_train, x_test, y_train, y_test = split
    logger.info(
        "Training fast head on %d samples (%d test), dim=%d",
        len(y_train),
        len(y_test),
        x_train.shape[1],
    )

    model = JaxMLPClassifier.from_config(settings.nn)
    model.fit(x_train, y_train)

    y_pred = [str(item) for item in model.predict(x_test)]
    metrics = compute_ser_metrics(y_true=y_test, y_pred=y_pred)
    # Persisted-report schema parity: the reference's training_report.json
    # keys (training_reporting.py:121-171 build_training_report) plus this
    # repo's extras (uar/confusion at top level, iteration diagnostics).
    import glob as _glob
    from collections import Counter
    from datetime import UTC, datetime

    all_labels = [str(item) for item in (*y_train, *y_test)]
    corpus_samples = len(_glob.glob(settings.dataset.glob_pattern))
    effective_samples = len(y_train) + len(y_test)
    report: dict[str, Any] = {
        "profile": "fast",
        "backend_id": "handcrafted",
        "artifact_version": artifacts.MODEL_ARTIFACT_VERSION,
        "artifact_schema_version": artifacts.ARTIFACT_SCHEMA_VERSION,
        "created_at_utc": datetime.now(tz=UTC).isoformat(),
        "dataset_glob_pattern": settings.dataset.glob_pattern,
        "dataset_corpus_samples": corpus_samples,
        "dataset_effective_samples": effective_samples,
        "dataset_skipped_samples": max(0, corpus_samples - effective_samples),
        "accuracy": accuracy(y_test, y_pred),
        "uar": metrics["uar"],
        "macro_f1": metrics["macro_f1"],
        "per_class_recall": metrics["per_class_recall"],
        "confusion_matrix": metrics["confusion_matrix"],
        "metrics": metrics,
        "labels": sorted(set(all_labels)),
        "label_distribution": dict(Counter(all_labels)),
        "train_samples": len(y_train),
        "training_samples": len(y_train),
        "test_samples": len(y_test),
        "feature_vector_size": int(x_train.shape[1]),
        "n_iter": model.n_iter_,
        "final_loss": model.loss_,
        "elapsed_seconds": time.time() - started,
    }

    metadata = artifacts.build_artifact_metadata(
        feature_vector_size=int(x_train.shape[1]),
        training_samples=len(y_train),
        labels=sorted(set(y_train)),
        backend_id="handcrafted",
        profile="fast",
        feature_dim=feature_dim(settings.feature_flags),
        pooling_strategy="mean",
        device="cpu",
        dtype="float32",
        seed=settings.nn.random_state,
        provenance={
            "framework": "ser_tpu",
            "trainer": "fast_training",
            # Reference license_check.py:427-470 provenance facts.
            **_license_provenance(settings),
        },
        evaluation_summary={
            "accuracy": report["accuracy"],
            "uar": report["uar"],
            "macro_f1": report["macro_f1"],
        },
    )
    envelope = artifacts.build_model_artifact(model, metadata)
    model_path = artifacts.save_model_artifact(envelope, settings.models.model_file)
    report["model_path"] = model_path
    report["artifact_metadata"] = metadata
    # The metadata sidecar is this repo's secure twin (inspectable without
    # unpickling; reference ships a skops artifact in this slot).
    _target = Path(model_path)
    report["model_artifacts"] = {
        "pickle": str(model_path),
        "secure": str(_target.with_suffix(_target.suffix + ".meta.json")),
    }

    settings.models.folder.mkdir(parents=True, exist_ok=True)
    settings.models.training_report_file.write_text(
        json.dumps(report, indent=2, default=str), encoding="utf-8"
    )
    report["report_path"] = str(settings.models.training_report_file)
    logger.info(
        "Fast training done: accuracy=%.3f uar=%.3f macro_f1=%.3f (%d iters)",
        report["accuracy"],
        report["uar"],
        report["macro_f1"],
        model.n_iter_,
    )
    return report


def train_from_prepared(
    *, plan_path, settings: AppConfig, profile: str = "fast"
) -> dict[str, Any]:
    """Trains the head from a digest-validated prepared plan (resume path).

    Profile-aware: the plan's backend fingerprint is digest-validated against
    the ACTIVE runtime inside ``load_prepared_plan`` (an accurate plan cannot
    resume into a medium run), and the persisted artifact carries the real
    backend/model-id/pooling metadata so load-time compat filters keep
    working.
    """
    from sklearn.model_selection import train_test_split

    from ser_tpu._internal.config.schema import profile_artifact_file_names
    from ser_tpu._internal.models.training_readiness import load_prepared_plan
    from ser_tpu._internal.repr.encoders import resolved_model_id
    from ser_tpu.profiles import get_profile_catalog

    features, labels, groups = load_prepared_plan(
        plan_path, settings=settings, profile=profile
    )
    spec = get_profile_catalog()[profile]
    if groups is not None and len(set(groups)) >= 2:
        # Group-disjoint resume split: encoder plans carry PER-WINDOW rows,
        # and sibling windows of one clip/speaker in both train and test
        # inflate the reported metrics (the full training path splits
        # speaker-disjoint; resume must match).
        from sklearn.model_selection import GroupShuffleSplit

        splitter = GroupShuffleSplit(
            n_splits=1,
            test_size=settings.training.test_size,
            random_state=settings.training.random_state,
        )
        train_idx, test_idx = next(splitter.split(features, labels, groups))
        x_train, x_test = features[train_idx], features[test_idx]
        y_train = [labels[i] for i in train_idx]
        y_test = [labels[i] for i in test_idx]
    else:
        try:
            x_train, x_test, y_train, y_test = train_test_split(
                features,
                labels,
                test_size=settings.training.test_size,
                random_state=settings.training.random_state,
                stratify=labels if settings.training.stratify_split else None,
            )
        except ValueError:
            # Tiny classes: fall back to unstratified, like loader.load_data.
            x_train, x_test, y_train, y_test = train_test_split(
                features,
                labels,
                test_size=settings.training.test_size,
                random_state=settings.training.random_state,
            )
    model = JaxMLPClassifier.from_config(settings.nn)
    model.fit(x_train, y_train)
    y_pred = [str(item) for item in model.predict(x_test)]
    metrics = compute_ser_metrics(y_true=y_test, y_pred=y_pred)
    report = {
        "profile": profile,
        "backend_id": spec.backend_id,
        "accuracy": accuracy(y_test, y_pred),
        "uar": metrics["uar"],
        "macro_f1": metrics["macro_f1"],
        "training_samples": len(y_train),
        "from_prepared_plan": str(plan_path),
    }
    metadata = artifacts.build_artifact_metadata(
        feature_vector_size=int(x_train.shape[1]),
        training_samples=len(y_train),
        labels=sorted(set(y_train)),
        backend_id=spec.backend_id,
        profile=profile,
        pooling_strategy="mean" if profile == "fast" else "mean_std",
        backend_model_id=resolved_model_id(profile, settings)
        if profile != "fast"
        else spec.model.default_model_id,
        seed=settings.nn.random_state,
        provenance={
            "framework": "ser_tpu",
            "trainer": "prepared_plan",
            **_license_provenance(settings),
        },
    )
    if profile == "fast":
        model_path = settings.models.model_file
    else:
        names = profile_artifact_file_names(
            profile=profile,
            medium_model_id=settings.models.medium_model_id,
            accurate_model_id=settings.models.accurate_model_id,
            accurate_research_model_id=settings.models.accurate_research_model_id,
        )
        model_path = settings.models.folder / names[0]
    report["model_path"] = artifacts.save_model_artifact(
        artifacts.build_model_artifact(model, metadata), model_path
    )
    return report


__all__ = ["TrainingDataError", "train_fast_model", "train_from_prepared"]
