"""Encoder-profile training: utterances → embeddings → windows → head → artifact.

Parity surface: reference ``medium_training_preparation.py:184-410`` /
``accurate_training_preparation.py`` — speaker-disjoint split, backend encode
with embedding-cache reuse, per-window mean+std dataset with noise controls
(``medium_noise_controls.py``: minimum window std, max windows per clip),
head fit, grouped per-sample metrics, artifact v3 with backend/model-id/
device/dtype metadata.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any

import numpy as np

from ser_tpu._internal.config.bootstrap import reload_settings
from ser_tpu._internal.config.schema import AppConfig, profile_artifact_file_names
from ser_tpu._internal.data import loader
from ser_tpu._internal.models import artifacts
from ser_tpu._internal.models.noise_controls import NoiseControlStats, apply_noise_controls
from ser_tpu._internal.pool import mean_std_pool, temporal_pooling_windows
from ser_tpu._internal.repr import FeatureBackend
from ser_tpu._internal.repr.runtime_policy import resolve_feature_runtime
from ser_tpu._internal.train.eval import speaker_disjoint_split
from ser_tpu._internal.train.metrics import (
    accuracy,
    compute_grouped_ser_metrics_by_sample,
    compute_sample_level_ser_metrics,
    compute_ser_metrics,
)
from ser_tpu._internal.utils.audio_io import read_audio_file
from ser_tpu._internal.utils.logger import get_logger
from ser_tpu.models.mlp_head import JaxMLPClassifier
from ser_tpu.profiles import ProfileName, get_profile_catalog

logger = get_logger(__name__)


def _license_provenance(settings, backend_id: str, profile: str) -> dict:
    from ser_tpu._internal.runtime.restricted_backends import build_provenance_metadata

    return build_provenance_metadata(
        settings=settings, backend_id=backend_id, profile=profile
    )


def group_metrics_min_support() -> int:
    """Minimum per-group sample support for corpus/language metrics.

    Parity: reference ``models/training_support.py:269-279`` —
    ``SER_GROUP_METRICS_MIN_SUPPORT`` env var, default 20, invalid values
    fall back to the default, floor of 1.
    """
    raw = os.getenv("SER_GROUP_METRICS_MIN_SUPPORT", "").strip()
    if not raw:
        return 20
    try:
        value = int(raw)
    except ValueError:
        return 20
    return max(1, value)


def _windowed_dataset(
    *,
    files: list[tuple[str, str, str | None]],  # (path, label, speaker)
    backend: FeatureBackend,
    settings: AppConfig,
    window_size: float,
    window_stride: float,
    cache=None,
) -> tuple[np.ndarray, list[str], list[str], NoiseControlStats]:
    """Per-window mean+std features with labels, sample ids, and noise stats."""
    min_std = settings.medium_training.min_window_std
    max_windows = settings.medium_training.max_windows_per_clip

    # Cache-probe then batch-encode misses in cross-clip chunk batches (TPU
    # path). Waveform residency is BOUNDED: decoded audio lives only until
    # its chunk encodes — holding every waveform of a large manifest corpus
    # simultaneously risked host OOM before any pooling happened.
    from ser_tpu._internal.repr.encode_util import encode_clips

    encode_chunk_clips = 64  # plenty for the cross-clip attention budget
    encoded_by_path: dict[str, object] = {}
    pending: list[str] = []
    pending_audio: dict[str, tuple[np.ndarray, int]] = {}

    def flush_pending() -> None:
        if not pending:
            return
        for path, encoded in zip(
            pending, encode_clips(backend, [pending_audio[p] for p in pending])
        ):
            encoded_by_path[path] = encoded
        if cache is not None:
            for path in pending:
                cache.store(path, encoded_by_path[path], audio=pending_audio[path][0])
        pending.clear()
        pending_audio.clear()

    from ser_tpu._internal.models.training_orchestration import (
        bounded_retry_local_io,
        handle_sample_encoding_failure,
        record_cache_probe,
    )

    all_labels: list[str | None] = [label for _path, label, _speaker in files]
    quarantined_labels: list[str | None] = []
    quarantined_paths: set[str] = set()
    for path, label, _speaker in files:
        try:
            audio, sr = bounded_retry_local_io(
                lambda path=path: read_audio_file(
                    path, audio_read_config=settings.audio_read
                ),
                identity=path,
            )
        except Exception as err:  # noqa: BLE001 - containment is classified
            # A sample that vanished or went corrupt AFTER readiness may be
            # dropped only while every quarantine budget still holds.
            if handle_sample_encoding_failure(
                settings=settings,
                sample_path=path,
                label=label,
                error=err,
                all_labels=all_labels,
                quarantined_labels=quarantined_labels,
            ):
                quarantined_labels.append(label)
                quarantined_paths.add(path)
                continue
            raise
        if cache is not None:
            hit = cache.load(path, audio=audio)
            record_cache_probe(hit=hit is not None)
            if hit is not None:
                encoded_by_path[path] = hit
                continue
        pending.append(path)
        pending_audio[path] = (audio, sr)
        if len(pending) >= encode_chunk_clips:
            flush_pending()
    flush_pending()

    rows, labels, sample_ids = [], [], []
    noise_stats = NoiseControlStats()
    for path, label, _speaker in files:
        if path in quarantined_paths:
            continue
        encoded = encoded_by_path[path]
        windows = temporal_pooling_windows(
            encoded, window_size_seconds=window_size, window_stride_seconds=window_stride
        )
        pooled = mean_std_pool(encoded, windows)
        kept, _, clip_stats = apply_noise_controls(
            pooled, min_window_std=min_std, max_windows_per_clip=max_windows
        )
        noise_stats = noise_stats.merged(clip_stats)
        for row in kept:
            rows.append(row)
            labels.append(label)
            sample_ids.append(path)
    if not rows:
        raise RuntimeError("No training windows survived the noise controls.")
    return np.vstack(rows), labels, sample_ids, noise_stats


def train_encoder_profile_model(
    *,
    profile: ProfileName,
    settings: AppConfig | None = None,
    backend: FeatureBackend | None = None,
) -> dict[str, Any]:
    """Trains one encoder-backed profile head end to end.

    ``backend`` injection is the designed test seam (reference backends accept
    injected doubles, SURVEY.md §4).
    """
    settings = settings if settings is not None else reload_settings()
    spec = get_profile_catalog()[profile]
    started = time.time()

    from ser_tpu._internal.models.training_orchestration import (
        current_training_run,
        ensure_entrypoint_readiness,
        training_operation_scope,
    )
    from contextlib import nullcontext

    scope = (
        nullcontext() if current_training_run() is not None
        else training_operation_scope(profile)
    )
    with scope:
        ensure_entrypoint_readiness(settings=settings, profile=profile, backend=backend)
        return _train_encoder_profile_model_ready(
            profile=profile, settings=settings, backend=backend, spec=spec, started=started
        )


def _split_training_files(
    *,
    files: list[tuple[str, str, str | None]],
    settings: AppConfig,
) -> tuple[
    list[tuple[str, str, str | None]],
    list[tuple[str, str, str | None]],
    dict[str, Any],
]:
    """Train/test file split with the reference's ladder and provenance.

    Manifest-attributed runs split at utterance granularity
    (``dataset_splitting.split_utterances``: manifest split -> grouped ->
    salted hash, reference ``models/dataset_splitting.py:254-366``); glob
    runs use the speaker-disjoint grouped split with this repo's rare-class
    pullback extension.
    """
    from pathlib import Path

    from ser_tpu._internal.models.dataset_splitting import split_utterances

    if settings.dataset.manifest_paths:
        try:
            utterances = loader.load_utterances(settings=settings) or []
        except Exception as err:  # noqa: BLE001 - fall back to file split
            logger.warning("Manifest split unavailable: %s", err)
            utterances = []
        # Recipe-audited runs take the ledger's split assignment (reference
        # data_loader.py:74-99); a failed audit ABORTS training rather than
        # degrading to an unaudited split.
        utterances = loader.apply_recipe_ledger(utterances, settings=settings) or []
        by_resolved = {str(Path(u.audio_path).resolve()): u for u in utterances}
        file_by_resolved = {str(Path(item[0]).resolve()): item for item in files}
        if by_resolved and set(file_by_resolved) <= set(by_resolved):
            samples = [by_resolved[key] for key in file_by_resolved]
            train_u, test_u, metadata = split_utterances(
                samples=samples, settings=settings
            )
            train = [
                file_by_resolved[str(Path(u.audio_path).resolve())] for u in train_u
            ]
            test = [
                file_by_resolved[str(Path(u.audio_path).resolve())] for u in test_u
            ]
            return train, test, metadata.as_dict()

    # Falling through means the manifest/ledger split was NOT used (no
    # manifests, load failure, or discovered files not covered by the
    # manifest rows). Any provenance digests stamped by apply_recipe_ledger
    # would now be a false claim on the artifact — clear them.
    from ser_tpu._internal.models.training_orchestration import current_training_run

    run_state = current_training_run()
    if run_state is not None and run_state.recipe_digest is not None:
        logger.warning(
            "Audited recipe split not applied (files outside manifest "
            "coverage); clearing artifact provenance digests."
        )
        run_state.recipe_digest = None
        run_state.split_ledger_digest = None

    train, test = speaker_disjoint_split(
        files,
        speaker_of=lambda item: item[2] or item[0],
        label_of=lambda item: item[1],
        test_size=settings.training.test_size,
        random_state=settings.training.random_state,
    )
    resolved = [item[2] for item in files if item[2] is not None]
    train_speakers = {item[2] for item in train if item[2] is not None}
    test_speakers = {item[2] for item in test if item[2] is not None}
    speaker_grouped = len({item[2] or item[0] for item in files}) >= 2
    overlap = len(train_speakers & test_speakers)
    if speaker_grouped and overlap > 0:
        raise RuntimeError(
            "Grouped training split produced overlapping speakers in train/test."
        )
    return (
        train,
        test,
        {
            "split_strategy": (
                "group_shuffle_split"
                if speaker_grouped
                else "stratified_shuffle_split_fallback"
            ),
            "speaker_grouped": speaker_grouped,
            "speaker_id_coverage": len(resolved) / len(files),
            "train_unique_speakers": len(train_speakers),
            "test_unique_speakers": len(test_speakers),
            "speaker_overlap_count": overlap,
        },
    )


def _train_encoder_profile_model_ready(
    *, profile, settings, backend, spec, started
) -> dict[str, Any]:
    from ser_tpu._internal.repr.encoders import resolved_model_id

    if backend is None:
        from ser_tpu._internal.repr.encoders import build_encoder_backend

        backend = build_encoder_backend(profile, settings=settings)

    # Manifest-aware attribution (corpus/label/speaker), shared with
    # readiness: RAVDESS-code-only parsing silently dropped every
    # manifest-configured corpus from encoder training.
    from ser_tpu._internal.models.training_readiness import _file_records

    records = _file_records(loader.discover_dataset_files(settings), settings)
    files = [
        (record.path, record.label, record.speaker)
        for record in records
        if record.label is not None
    ]
    groups_by_path = {
        record.path: (record.corpus, record.language or "unknown") for record in records
    }
    if not files:
        raise RuntimeError("No labeled dataset files found for encoder training.")

    train_files, test_files, split_metadata = _split_training_files(
        files=files, settings=settings
    )

    from ser_tpu._internal.data.embedding_cache import EmbeddingCache

    runtime = resolve_feature_runtime(
        spec.backend_id,
        torch_runtime=settings.torch_runtime,
        policy=settings.feature_runtime_policy,
    )
    cache = EmbeddingCache(
        root=settings.tmp_folder / "embedding-cache",
        backend_id=spec.backend_id,
        model_id=resolved_model_id(profile, settings) or "none",
        revision="local",
        device=runtime.device_kind,
        dtype=runtime.dtype,
    )

    runtime_config = settings.profile_runtime(profile)  # type: ignore[arg-type]
    x_train, y_train, _, train_noise_stats = _windowed_dataset(
        files=train_files,
        backend=backend,
        settings=settings,
        window_size=runtime_config.pool_window_size_seconds,
        window_stride=runtime_config.pool_window_stride_seconds,
        cache=cache,
    )
    x_test, y_test, test_ids, test_noise_stats = _windowed_dataset(
        files=test_files,
        backend=backend,
        settings=settings,
        window_size=runtime_config.pool_window_size_seconds,
        window_stride=runtime_config.pool_window_stride_seconds,
        cache=cache,
    )

    model = JaxMLPClassifier.from_config(settings.nn)
    model.fit(x_train, y_train)
    y_pred = [str(item) for item in model.predict(x_test)]
    window_metrics = compute_ser_metrics(y_true=y_test, y_pred=y_pred)
    grouped = compute_sample_level_ser_metrics(
        y_true=y_test, y_pred=y_pred, sample_ids=test_ids
    )
    # Corpus/language breakdown over per-sample majority votes (reference
    # training_support.py:188-207 attach_grouped_training_metrics; min
    # support from SER_GROUP_METRICS_MIN_SUPPORT, default 20).
    min_support = group_metrics_min_support()
    corpus_ids = [groups_by_path[i][0] for i in test_ids]
    language_ids = [groups_by_path[i][1] for i in test_ids]
    group_metrics = {
        "by_corpus": compute_grouped_ser_metrics_by_sample(
            y_true=y_test,
            y_pred=y_pred,
            sample_ids=test_ids,
            group_ids=corpus_ids,
            min_support=min_support,
        ),
        "by_language": compute_grouped_ser_metrics_by_sample(
            y_true=y_test,
            y_pred=y_pred,
            sample_ids=test_ids,
            group_ids=language_ids,
            min_support=min_support,
        ),
    }

    # The RESOLVED id (settings override wins) — the id the backend loaded.
    model_id = resolved_model_id(profile, settings)
    from collections import Counter
    from datetime import UTC, datetime

    report: dict[str, Any] = {
        "profile": profile,
        "backend_id": spec.backend_id,
        "backend_model_id": model_id,
        # Reference persisted-report schema (training_reporting.py:121-171).
        "artifact_version": artifacts.MODEL_ARTIFACT_VERSION,
        "artifact_schema_version": artifacts.ARTIFACT_SCHEMA_VERSION,
        "created_at_utc": datetime.now(tz=UTC).isoformat(),
        "train_samples": len(train_files),
        "test_samples": len(test_files),
        "label_distribution": dict(Counter([*y_train, *y_test])),
        "metrics": window_metrics,
        "accuracy": accuracy(y_test, y_pred),
        "uar": window_metrics["uar"],
        "macro_f1": window_metrics["macro_f1"],
        "per_class_recall": window_metrics["per_class_recall"],
        "grouped": {
            "uar": grouped["uar"],
            "macro_f1": grouped["macro_f1"],
            "samples_evaluated": grouped["samples_evaluated"],
        },
        "group_metrics": group_metrics,
        "split_metadata": split_metadata,
        "train_noise_stats": train_noise_stats.as_dict(),
        "test_noise_stats": test_noise_stats.as_dict(),
        "labels": window_metrics["labels"],
        "training_windows": len(y_train),
        "test_windows": len(y_test),
        "feature_vector_size": int(x_train.shape[1]),
        "elapsed_seconds": time.time() - started,
    }
    from ser_tpu._internal.models.training_orchestration import current_training_run

    run_state = current_training_run()
    if run_state is not None:
        # Reference report payload carries the containment audit trail
        # (training_orchestration.py:700-712).
        report["containment"] = dict(sorted(run_state.containment_counts.items()))
        report["cache_probes"] = {
            "hits": run_state.cache_hits,
            "misses": run_state.cache_misses,
        }
        if run_state.quarantined_sample_paths:
            report["quarantined_mid_training"] = sorted(
                run_state.quarantined_sample_paths
            )

    metadata = artifacts.build_artifact_metadata(
        feature_vector_size=int(x_train.shape[1]),
        training_samples=len(y_train),
        labels=sorted(set(y_train)),
        backend_id=spec.backend_id,
        profile=profile,
        # The classifier INPUT dim (pooled), not the raw encoder dim — the
        # reference requires feature_dim == feature_vector_size at load
        # (artifact_metadata.py:109-111; training_orchestration.py:436-448).
        feature_dim=int(x_train.shape[1]),
        frame_size_seconds=runtime_config.pool_window_size_seconds,
        frame_stride_seconds=runtime_config.pool_window_stride_seconds,
        pooling_strategy="mean_std",
        backend_model_id=model_id,
        device=runtime.device_kind,
        dtype=runtime.dtype,
        seed=settings.nn.random_state,
        provenance={
            "framework": "ser_tpu",
            "trainer": "encoder_training",
            # License/access facts at training time (reference
            # license_check.py:427-470 build_provenance_metadata).
            **_license_provenance(settings, spec.backend_id, profile),
        },
        evaluation_summary={
            "accuracy": report["accuracy"],
            "uar": report["uar"],
            "macro_f1": report["macro_f1"],
        },
        # Audited-recipe provenance (set by loader.apply_recipe_ledger when a
        # --dataset-recipe run passed its audit): the reference's v3 fields
        # (artifact_envelope.py:66-67), absent on non-recipe runs.
        recipe_digest=run_state.recipe_digest if run_state else None,
        split_ledger_digest=run_state.split_ledger_digest if run_state else None,
    )
    names = profile_artifact_file_names(
        profile=profile,
        medium_model_id=settings.models.medium_model_id,
        accurate_model_id=settings.models.accurate_model_id,
        accurate_research_model_id=settings.models.accurate_research_model_id,
    )
    model_path = artifacts.save_model_artifact(
        artifacts.build_model_artifact(model, metadata),
        settings.models.folder / names[0],
    )
    report["model_path"] = model_path
    report_path = settings.models.folder / names[2]
    report_path.write_text(json.dumps(report, indent=2, default=str), encoding="utf-8")
    report["report_path"] = str(report_path)
    logger.info(
        "%s training done: window-uar=%.3f grouped-uar=%.3f",
        profile,
        report["uar"],
        report["grouped"]["uar"],
    )
    return report


__all__ = ["train_encoder_profile_model"]
