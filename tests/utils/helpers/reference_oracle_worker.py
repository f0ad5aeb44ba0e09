"""Reference-oracle worker: executes jsugg/ser's pure-Python stages on demand.

Runs as a subprocess (``python -I``) with ``sys.path`` pointing at the
reference checkout so the repo's drop-in ``ser`` alias package never shadows
the real reference. Unavailable heavy deps (librosa/soundfile) are stubbed —
none of the parity-target stages touch them at call time; they are only pulled
in transitively by package ``__init__`` chains
(``/root/reference/ser/_internal/repr/__init__.py`` imports ``handcrafted``).

Protocol: length-prefixed pickles over stdin/stdout. Request:
``{"op": str, ...payload}``. Response: ``{"ok": result}`` or
``{"error": exception_class_name, "message": str}`` so error-raising parity is
assertable too. Payloads are plain primitives + numpy arrays; reference domain
objects are constructed here, never pickled across the boundary.
"""

from __future__ import annotations

import pickle
import struct
import sys
import tempfile
import types
from pathlib import Path
from types import SimpleNamespace

REFERENCE_ROOT = "/root/reference"


def _install_stub_modules() -> None:
    """Registers import stubs for deps absent in this environment."""
    for name in ("librosa", "librosa.feature", "librosa.effects", "soundfile"):
        if name not in sys.modules:
            sys.modules[name] = types.ModuleType(name)


_install_stub_modules()
sys.path.insert(0, REFERENCE_ROOT)

import numpy as np  # noqa: E402

from ser._internal.config import artifact_naming as ref_artifact_naming  # noqa: E402
from ser._internal.pool import stats_pool as ref_stats_pool  # noqa: E402
from ser._internal.pool import windowing as ref_windowing  # noqa: E402
from ser._internal.repr import EncodedSequence, PoolingWindow, overlap_frame_mask  # noqa: E402
from ser._internal.runtime import postprocessing as ref_postprocessing  # noqa: E402
from ser._internal.utils import segment_canonicalization as ref_canonicalization  # noqa: E402
from ser._internal.utils import subtitles as ref_subtitles  # noqa: E402
from ser._internal.utils import timeline_utils as ref_timeline  # noqa: E402
from ser.config import TimelineConfig  # noqa: E402
from ser.domain import EmotionSegment, TimelineEntry, TranscriptWord  # noqa: E402
from ser.runtime.schema import FramePrediction  # noqa: E402
import ser.profiles as ref_profiles  # noqa: E402


def _frames_from_payload(frames: list[dict]) -> list[FramePrediction]:
    return [
        FramePrediction(
            start_seconds=item["start_seconds"],
            end_seconds=item["end_seconds"],
            emotion=item["emotion"],
            confidence=item["confidence"],
            probabilities=item["probabilities"],
        )
        for item in frames
    ]


def _encoded_from_payload(payload: dict) -> EncodedSequence:
    embeddings = payload.get("embeddings")
    starts = np.asarray(payload["frame_starts"], dtype=np.float64)
    if embeddings is None:
        embeddings = np.zeros((starts.size, 1), dtype=np.float32)
    return EncodedSequence(
        embeddings=np.asarray(embeddings, dtype=np.float32),
        frame_start_seconds=starts,
        frame_end_seconds=np.asarray(payload["frame_ends"], dtype=np.float64),
        backend_id=payload.get("backend_id", "oracle"),
    )


def op_postprocess(payload: dict) -> list[dict]:
    config = ref_postprocessing.SegmentPostprocessingConfig(**payload["config"])
    segments = ref_postprocessing.postprocess_frame_predictions(
        _frames_from_payload(payload["frames"]), config=config
    )
    return [
        {
            "emotion": seg.emotion,
            "start_seconds": seg.start_seconds,
            "end_seconds": seg.end_seconds,
            "confidence": seg.confidence,
            "probabilities": seg.probabilities,
        }
        for seg in segments
    ]


def op_windows(payload: dict) -> list[tuple[float, float]]:
    windows = ref_windowing.temporal_pooling_windows(
        _encoded_from_payload(payload),
        window_size_seconds=payload["window_size_seconds"],
        window_stride_seconds=payload["window_stride_seconds"],
    )
    return [(window.start_seconds, window.end_seconds) for window in windows]


def op_pool(payload: dict) -> np.ndarray:
    encoded = _encoded_from_payload(payload)
    windows = [
        PoolingWindow(start_seconds=start, end_seconds=end)
        for start, end in payload["windows"]
    ]
    return ref_stats_pool.mean_std_pool(encoded, windows)


def op_overlap_mask(payload: dict) -> list[bool]:
    encoded = _encoded_from_payload(payload)
    window = PoolingWindow(
        start_seconds=payload["window"][0], end_seconds=payload["window"][1]
    )
    return overlap_frame_mask(encoded, window).tolist()


def op_canonicalize(payload: dict) -> list[tuple[str, float, float]]:
    segments = [SimpleNamespace(**item) for item in payload["segments"]]
    canonical = ref_canonicalization.canonicalize_segments(segments)
    return [(seg.emotion, seg.start_seconds, seg.end_seconds) for seg in canonical]


def op_build_timeline(payload: dict) -> list[tuple[float, str, str]]:
    words = [TranscriptWord(*item) for item in payload["words"]]
    segments = [EmotionSegment(*item) for item in payload["segments"]]
    timeline = ref_timeline.build_timeline(words, segments)
    return [(entry.timestamp_seconds, entry.emotion, entry.speech) for entry in timeline]


def op_classify_failure(payload: dict) -> dict:
    """Runs the reference failure-classification ladder on a rebuilt exception."""
    from ser._internal.data.manifest import Utterance as RefUtterance
    from ser._internal.models import training_readiness as ref_tr
    from ser._internal.utils.audio_utils import AudioDecodeError, AudioIntegrityError

    kind = payload["error"]
    message = payload.get("message", "boom")
    if kind == "audio_integrity":
        error = AudioIntegrityError(message)
    elif kind == "audio_decode":
        error = AudioDecodeError(message)
    elif kind == "file_not_found":
        error = FileNotFoundError(2, message, payload.get("filename"))
    elif kind == "os_errno":
        error = OSError(payload["errno"], message)
    elif kind == "timeout":
        error = TimeoutError(message)
    elif kind == "window":
        error = ref_tr.WindowContainmentError(message)
    elif kind == "cache":
        error = ref_tr.CacheEntryCorruptError(message)
    elif kind == "optional_artifact":
        error = ref_tr.OptionalArtifactError(message)
    else:
        error = RuntimeError(message)
    sample = None
    if payload.get("sample_path"):
        sample = RefUtterance(
            schema_version=2,
            sample_id="parity/sample",
            corpus="ravdess",
            audio_path=Path(payload["sample_path"]),
            label="happy",
        )
    classification = ref_tr.classify_failure(
        error,
        scope=ref_tr.FailureScope(payload["scope"]),
        sample=sample,
        allowed_roots=tuple(Path(r) for r in payload.get("allowed_roots", ())),
    )
    return {
        "scope": str(classification.scope),
        "reason_code": str(classification.reason_code),
        "disposition": str(classification.disposition),
        "severity": str(classification.severity),
    }


def op_timeline_csv(payload: dict) -> bytes:
    timeline = [TimelineEntry(*item) for item in payload["timeline"]]
    with tempfile.TemporaryDirectory() as tmp:
        config = TimelineConfig(folder=Path(tmp))
        path = ref_timeline.save_timeline_to_csv(
            timeline, payload["file_name"], timeline_config=config
        )
        return Path(path).read_bytes()


def op_subtitles_render(payload: dict) -> dict:
    timeline = [TimelineEntry(*item) for item in payload["timeline"]]
    with tempfile.TemporaryDirectory() as tmp:
        config = TimelineConfig(folder=Path(tmp))
        path = ref_subtitles.save_timeline_to_subtitles(
            timeline,
            payload["file_name"],
            subtitle_format=payload["subtitle_format"],
            timeline_config=config,
        )
        return {"name": Path(path).name, "text": Path(path).read_text(encoding="utf-8")}


def op_subtitle_request(payload: dict) -> tuple | None:
    return ref_subtitles.resolve_subtitle_export_request(
        output_path=payload["output_path"],
        subtitle_format=payload["subtitle_format"],
    )


def op_subtitle_cues(payload: dict) -> list[tuple[float, float, str, str]]:
    timeline = [TimelineEntry(*item) for item in payload["timeline"]]
    cues = ref_subtitles.timeline_to_subtitle_cues(
        timeline, default_duration_seconds=payload.get("default_duration_seconds", 1.0)
    )
    return [(cue.start_seconds, cue.end_seconds, cue.text, cue.emotion) for cue in cues]


def op_resolve_profile(payload: dict) -> str:
    settings = SimpleNamespace(runtime_flags=SimpleNamespace(**payload["flags"]))
    return ref_profiles.resolve_profile_name(settings)


def op_available_profiles(payload: dict) -> dict:
    return {
        name: profile.description
        for name, profile in ref_profiles.available_profiles().items()
    }


def op_catalog_snapshot(payload: dict) -> dict:
    catalog = ref_profiles.get_profile_catalog()

    def _as_plain(value):
        if hasattr(value, "__dataclass_fields__"):
            return {
                name: _as_plain(getattr(value, name))
                for name in value.__dataclass_fields__
            }
        if isinstance(value, tuple):
            return [_as_plain(item) for item in value]
        return value

    return {name: _as_plain(entry) for name, entry in catalog.items()}


def op_catalog_validate(payload: dict) -> dict:
    try:
        ref_profiles._validate_catalog_entry(payload["name"], payload["raw"])
    except Exception as error:  # noqa: BLE001 - raise/no-raise parity is the contract
        return {"raised": True, "type": type(error).__name__}
    return {"raised": False, "type": None}


def op_artifact_names(payload: dict) -> dict:
    suffix = ref_artifact_naming.artifact_model_id_suffix(payload["model_id"])
    names = ref_artifact_naming.profile_artifact_file_names(
        profile=payload["profile"],
        medium_model_id=payload["medium_model_id"],
        accurate_model_id=payload["accurate_model_id"],
        accurate_research_model_id=payload["accurate_research_model_id"],
        default_fast_model_file_name="ser_model.pkl",
        default_fast_secure_model_file_name="ser_model.skops",
        default_fast_training_report_file_name="training_report.json",
    )
    profile = ref_artifact_naming.artifact_profile_from_runtime_flags(
        medium_profile=payload["flags"]["medium_profile"],
        accurate_profile=payload["flags"]["accurate_profile"],
        accurate_research_profile=payload["flags"]["accurate_research_profile"],
    )
    return {"suffix": suffix, "names": list(names), "profile_from_flags": profile}


def op_resolve_settings(payload: dict) -> dict:
    """Builds a reference AppConfig under a controlled environment and
    flattens the env-tunable knobs for field-by-field comparison."""
    import os

    from ser._internal.config import bootstrap as ref_bootstrap

    saved = dict(os.environ)
    try:
        for key in list(os.environ):
            if key.startswith(("SER_", "WHISPER_", "PYTORCH_", "DATASET_", "DEFAULT_")):
                del os.environ[key]
        os.environ.update(payload["env"])
        settings = ref_bootstrap.reload_settings()
    finally:
        os.environ.clear()
        os.environ.update(saved)

    def runtime(profile_runtime) -> dict:
        return {
            name: getattr(profile_runtime, name)
            for name in (
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
            )
        }

    return {
        "emotions": dict(settings.emotions),
        "default_language": settings.default_language,
        "dataset_folder": str(settings.dataset.folder),
        "dataset_recipe": settings.dataset.recipe,
        "dataset_strict_audit": settings.dataset.strict_audit,
        "manifest_paths": [str(p) for p in settings.dataset.manifest_paths],
        "data_loader": {
            name: getattr(settings.data_loader, name)
            for name in (
                "max_workers",
                "max_failed_file_ratio",
                "max_failed_files",
                "max_failed_file_ratio_per_corpus",
                "max_failed_file_ratio_per_class",
                "max_failures_per_reason",
                "min_remaining_per_class_split",
                "strict_quarantine",
            )
        },
        "training": {
            name: getattr(settings.training, name)
            for name in ("test_size", "dev_size", "random_state")
        },
        "flags": {
            name: getattr(settings.runtime_flags, name)
            for name in (
                "profile_pipeline",
                "medium_profile",
                "accurate_profile",
                "accurate_research_profile",
                "restricted_backends",
                "new_output_schema",
            )
        },
        "models": {
            "medium_model_id": settings.models.medium_model_id,
            "accurate_model_id": settings.models.accurate_model_id,
            "accurate_research_model_id": settings.models.accurate_research_model_id,
            "model_file_name": settings.models.model_file_name,
            "secure_model_file_name": settings.models.secure_model_file_name,
            "training_report_file_name": settings.models.training_report_file_name,
            "num_cores": settings.models.num_cores,
            "folder": str(settings.models.folder),
            "model_cache_dir": str(settings.models.model_cache_dir),
        },
        "tmp_folder": str(settings.tmp_folder),
        "transcripts_folder": str(settings.timeline.folder),
        "transcription": {
            "backend_id": settings.transcription.backend_id,
            "use_demucs": settings.transcription.use_demucs,
            "use_vad": settings.transcription.use_vad,
        },
        "medium_training": {
            "min_window_std": settings.medium_training.min_window_std,
            "max_windows_per_clip": settings.medium_training.max_windows_per_clip,
        },
        "quality_gate": {
            name: getattr(settings.quality_gate, name)
            for name in (
                "min_uar_delta",
                "min_macro_f1_delta",
                "max_medium_segments_per_minute",
                "min_medium_median_segment_duration_seconds",
            )
        },
        "schema": {
            "output_schema_version": settings.schema.output_schema_version,
            "artifact_schema_version": settings.schema.artifact_schema_version,
        },
        "runtimes": {
            "fast": runtime(settings.fast_runtime),
            "medium": runtime(settings.medium_runtime),
            "accurate": runtime(settings.accurate_runtime),
            "accurate-research": runtime(settings.accurate_research_runtime),
        },
    }


def op_ravdess_extract(payload: dict) -> list[tuple[str | None, str | None]]:
    from ser._internal.data.adapters import ravdess as ref_ravdess

    return [
        (
            ref_ravdess._extract_emotion_code(name),
            ref_ravdess._extract_speaker_id(name),
        )
        for name in payload["names"]
    ]


def op_crema_extract(payload: dict) -> list[tuple[str | None, str | None]]:
    from ser._internal.data.adapters import crema_d as ref_crema

    return [
        (
            ref_crema._extract_emotion_code(name),
            ref_crema._extract_actor_id(name),
        )
        for name in payload["names"]
    ]


def _ontology_from_payload(payload: dict):
    from ser._internal.data.ontology import LabelOntology

    spec = payload.get("ontology", {})
    return LabelOntology(
        ontology_id=spec.get("ontology_id", "default_v1"),
        allowed_labels=frozenset(spec.get("allowed_labels", ())),
        unknown_label_policy=spec.get("unknown_label_policy", "drop"),
        other_label=spec.get("other_label", "other"),
    )


def op_remap_label(payload: dict) -> dict:
    from ser._internal.data.ontology import remap_label

    ontology = _ontology_from_payload(payload)
    results = []
    for raw in payload["raw_labels"]:
        try:
            results.append(
                {
                    "label": remap_label(
                        raw_label=raw, mapping=payload.get("mapping"), ontology=ontology
                    )
                }
            )
        except ValueError as err:
            results.append({"error": str(err)})
    return {"results": results}


def op_ravdess_utterances(payload: dict) -> dict:
    from ser._internal.data.adapters.ravdess import build_ravdess_utterances

    try:
        utterances = build_ravdess_utterances(
            dataset_root=Path(payload["root"]),
            dataset_glob_pattern=payload["pattern"],
            emotion_code_map=payload["emotion_map"],
            default_language=payload.get("language", "en"),
            ontology=_ontology_from_payload(payload),
            max_failed_file_ratio=payload.get("max_failed_file_ratio", 0.01),
        )
    except RuntimeError as err:
        return {"raised": True, "message": str(err)}
    if utterances is None:
        return {"raised": False, "utterances": None}
    return {
        "raised": False,
        "utterances": [
            {
                "file_name": Path(str(u.audio_path)).name,
                "label": u.label,
                "raw_label": u.raw_label,
                "speaker": (u.speaker_id or "").split(":")[-1] or None,
                "language": u.language,
            }
            for u in utterances
        ],
    }


def op_ser_metrics(payload: dict) -> dict:
    from ser._internal.train import metrics as ref_metrics

    return ref_metrics.compute_ser_metrics(
        y_true=payload["y_true"],
        y_pred=payload["y_pred"],
        labels=payload.get("labels"),
    )


def op_grouped_metrics(payload: dict) -> dict:
    from ser._internal.train import metrics as ref_metrics

    return ref_metrics.compute_grouped_ser_metrics_by_sample(
        y_true=payload["y_true"],
        y_pred=payload["y_pred"],
        sample_ids=payload["sample_ids"],
        group_ids=payload["group_ids"],
        min_support=payload["min_support"],
    )


def op_segment_predictions(payload: dict) -> list[dict]:
    from ser._internal.models import fast_path as ref_fast_path

    segments = ref_fast_path.segment_predictions(_frames_from_payload(payload["frames"]))
    return [
        {
            "emotion": segment.emotion,
            "start_seconds": segment.start_seconds,
            "end_seconds": segment.end_seconds,
            "confidence": segment.confidence,
            "probabilities": segment.probabilities,
        }
        for segment in segments
    ]


def op_grouped_split(payload: dict) -> dict:
    from ser._internal.train import eval as ref_eval

    features = np.zeros((len(payload["labels"]), 1), dtype=np.float64)
    split = ref_eval.grouped_train_test_split(
        features,
        payload["labels"],
        payload["speaker_ids"],
        test_size=payload["test_size"],
        random_state=payload["random_state"],
    )
    return {
        "train": split.train_indices.tolist(),
        "test": split.test_indices.tolist(),
        "y_train": split.y_train,
        "y_test": split.y_test,
    }


def op_speaker_cv(payload: dict) -> list:
    from ser._internal.train import eval as ref_eval

    features = np.zeros((len(payload["labels"]), 1), dtype=np.float64)
    folds = ref_eval.speaker_independent_cv(
        features,
        payload["labels"],
        payload["speaker_ids"],
        n_splits=payload["n_splits"],
        random_state=payload["random_state"],
    )
    return [(train.tolist(), test.tolist()) for train, test in folds]


def op_extract_speaker_id(payload: dict) -> str | None:
    from ser._internal.train import eval as ref_eval

    return ref_eval.extract_ravdess_speaker_id(payload["file_name"])


def _ref_utterances(items: list[dict]):
    from ser._internal.data.manifest import Utterance as RefUtterance

    return [
        RefUtterance(
            schema_version=2,
            sample_id=item["sample_id"],
            corpus=item["corpus"],
            audio_path=Path(item["audio_path"]),
            label=item["label"],
            speaker_id=item.get("speaker_id"),
            split=item.get("split"),
        )
        for item in items
    ]


def op_hash_split(payload: dict) -> dict:
    from ser._internal.models import dataset_splitting as ref_splitting

    train, test = ref_splitting.hash_stratified_split(
        samples=_ref_utterances(payload["samples"]),
        test_size=payload["test_size"],
        salt=payload["salt"],
    )
    return {
        "train": [item.sample_id for item in train],
        "test": [item.sample_id for item in test],
    }


def op_split_utterances(payload: dict) -> dict:
    import logging

    from ser._internal.models import dataset_splitting as ref_splitting

    settings = SimpleNamespace(
        training=SimpleNamespace(
            test_size=payload["test_size"],
            random_state=payload["random_state"],
        )
    )
    train, test, metadata = ref_splitting.split_utterances(
        samples=_ref_utterances(payload["samples"]),
        settings=settings,
        logger=logging.getLogger("oracle"),
    )
    return {
        "train": [item.sample_id for item in train],
        "test": [item.sample_id for item in test],
        "metadata": {
            "split_strategy": metadata.split_strategy,
            "speaker_grouped": metadata.speaker_grouped,
            "speaker_id_coverage": metadata.speaker_id_coverage,
            "train_unique_speakers": metadata.train_unique_speakers,
            "test_unique_speakers": metadata.test_unique_speakers,
            "speaker_overlap_count": metadata.speaker_overlap_count,
        },
    }


def op_split_utterances_three_way(payload: dict) -> dict:
    import logging
    from dataclasses import dataclass

    from ser._internal.models import dataset_splitting as ref_splitting

    # Real (frozen) dataclasses: the reference three-way split rescales
    # dev_size via dataclasses.replace, which rejects SimpleNamespace.
    @dataclass(frozen=True)
    class _Training:
        test_size: float
        dev_size: float
        random_state: int

    @dataclass(frozen=True)
    class _Settings:
        training: _Training

    settings = _Settings(
        training=_Training(
            test_size=payload["test_size"],
            dev_size=payload["dev_size"],
            random_state=payload["random_state"],
        )
    )
    train, dev, test, metadata = ref_splitting.split_utterances_three_way(
        samples=_ref_utterances(payload["samples"]),
        settings=settings,
        logger=logging.getLogger("oracle"),
    )
    return {
        "train": [item.sample_id for item in train],
        "dev": [item.sample_id for item in dev],
        "test": [item.sample_id for item in test],
        "split_strategy": metadata.split_strategy,
        "speaker_overlap_count": metadata.speaker_overlap_count,
    }


def op_noise_controls(payload: dict) -> dict:
    from ser._internal.models import medium_noise_controls as ref_noise

    filtered, stats = ref_noise.apply_medium_noise_controls(
        np.asarray(payload["pooled"], dtype=np.float64),
        min_window_std=payload["min_window_std"],
        max_windows_per_clip=payload["max_windows_per_clip"],
    )
    return {
        "filtered": filtered,
        "stats": {
            "total_windows": stats.total_windows,
            "kept_windows": stats.kept_windows,
            "dropped_low_std_windows": stats.dropped_low_std_windows,
            "dropped_cap_windows": stats.dropped_cap_windows,
            "forced_keep_windows": stats.forced_keep_windows,
        },
    }


def _ref_normalized_segments(items: list[dict]):
    from ser._internal.runtime.quality_gate_evaluation import NormalizedSegment

    return [
        NormalizedSegment(
            emotion=item["emotion"],
            start_seconds=item["start_seconds"],
            end_seconds=item["end_seconds"],
        )
        for item in items
    ]


def op_clip_stability(payload: dict) -> dict:
    from ser._internal.runtime import quality_gate_evaluation as ref_gate

    rate, durations = ref_gate.clip_stability_metrics(
        _ref_normalized_segments(payload["segments"])
    )
    return {"rate": rate, "durations": durations}


def op_clip_label(payload: dict) -> str:
    from ser._internal.runtime import quality_gate_evaluation as ref_gate

    return ref_gate.clip_label_from_segments(
        _ref_normalized_segments(payload["segments"]),
        unknown_label=payload["unknown_label"],
    )


def op_compare_profiles(payload: dict) -> dict:
    from ser._internal.runtime import quality_gate_policy as ref_policy

    fast = SimpleNamespace(
        metrics=payload["fast_metrics"],
        temporal_stability=SimpleNamespace(**payload["fast_stability"]),
    )
    medium = SimpleNamespace(
        metrics=payload["medium_metrics"],
        temporal_stability=SimpleNamespace(**payload["medium_stability"]),
    )
    thresholds = SimpleNamespace(**payload["thresholds"])
    result = ref_policy.compare_profiles(
        fast=fast, medium=medium, thresholds=thresholds
    )
    return {
        "uar_delta": result.medium_minus_fast_uar,
        "macro_f1_delta": result.medium_minus_fast_macro_f1,
        "passes": result.passes_quality_gate,
        "failure_count": len(result.failure_reasons),
    }


def op_csv_label_mappings(payload: dict) -> dict:
    from ser._internal.data.catalog import public_datasets as ref_catalog

    out = {}
    for name in dir(ref_catalog):
        if name.endswith("_MANIFEST_SPEC"):
            spec = getattr(ref_catalog, name)
            out[spec.corpus_id] = dict(spec.label_mapping)
    return out


def op_retry_policy(payload: dict) -> dict:
    import logging

    from ser._internal.runtime.policy import run_with_retry_policy

    class _Timeout(Exception):
        pass

    class _Transient(Exception):
        pass

    class _Exhausted(Exception):
        pass

    sequence = list(payload["sequence"])
    attempts = {"n": 0}

    def operation():
        attempts["n"] += 1
        step = sequence[min(attempts["n"] - 1, len(sequence) - 1)]
        if step == "timeout":
            raise _Timeout("t")
        if step == "transient":
            raise _Transient("x")
        return "ok"

    config = SimpleNamespace(
        max_timeout_retries=payload["max_timeout_retries"],
        max_transient_retries=payload["max_transient_retries"],
        retry_backoff_seconds=0.0,
    )
    try:
        result = run_with_retry_policy(
            operation=operation,
            runtime_config=config,
            allow_retries=payload.get("allow_retries", True),
            profile_label="oracle",
            timeout_error_type=_Timeout,
            transient_error_type=_Transient,
            transient_exhausted_error=lambda err: _Exhausted(str(err)),
            retry_delay_seconds=lambda **kwargs: 0.0,
            logger=logging.getLogger("oracle"),
        )
        outcome = result
    except _Timeout:
        outcome = "timeout_raised"
    except _Exhausted:
        outcome = "transient_exhausted"
    return {"attempts": attempts["n"], "outcome": outcome}


def op_medium_inference_once(payload: dict) -> dict:
    """Runs the reference's pure medium execution pass end to end."""
    from ser._internal.runtime.medium_execution import run_medium_inference_once
    from ser._internal.runtime.medium_prediction import (
        confidence_and_probabilities,
        predict_labels,
    )

    encoded = _encoded_from_payload(payload)
    runtime_config = SimpleNamespace(
        pool_window_size_seconds=payload["window_size"],
        pool_window_stride_seconds=payload["window_stride"],
        post_smoothing_window_frames=payload["smoothing"],
        post_hysteresis_enter_confidence=payload["enter"],
        post_hysteresis_exit_confidence=payload["exit"],
        post_min_segment_duration_seconds=payload["min_segment"],
    )
    loaded = SimpleNamespace(
        model=payload["model"],
        expected_feature_size=payload.get("expected_feature_size"),
    )
    import logging

    def _confidence(model, features, expected_rows):
        return confidence_and_probabilities(
            model,
            features,
            expected_rows=expected_rows,
            logger=logging.getLogger("oracle"),
        )

    result = run_medium_inference_once(
        loaded_model=loaded,
        encoded=encoded,
        runtime_config=runtime_config,
        predict_labels=predict_labels,
        confidence_and_probabilities=_confidence,
    )
    return {
        "schema_version": result.schema_version,
        "frames": [
            (f.start_seconds, f.end_seconds, f.emotion, f.confidence, f.probabilities)
            for f in result.frames
        ],
        "segments": [
            (
                s.start_seconds,
                s.end_seconds,
                s.emotion,
                s.confidence,
                s.probabilities,
            )
            for s in result.segments
        ],
    }


def op_persist_artifact(payload: dict) -> dict:
    """Fits a tiny sklearn MLP and persists it with the REFERENCE envelope."""
    from ser._internal.models.artifact_envelope import build_model_artifact
    from ser._internal.models.artifact_persistence import persist_pickle_artifact

    from sklearn.neural_network import MLPClassifier

    x = np.asarray(payload["x"], dtype=np.float64)
    y = list(payload["y"])
    model = MLPClassifier(
        hidden_layer_sizes=(8,), max_iter=300, random_state=42
    ).fit(x, y)
    artifact = build_model_artifact(
        model=model,
        feature_vector_size=x.shape[1],
        training_samples=x.shape[0],
        labels=sorted(set(y)),
        backend_id=payload.get("backend_id", "handcrafted"),
        profile=payload.get("profile", "fast"),
    )
    persist_pickle_artifact(Path(payload["path"]), artifact)
    return {
        "predictions": [str(p) for p in model.predict(x)],
        "proba": np.asarray(model.predict_proba(x)).tolist(),
    }


def op_load_artifact(payload: dict) -> dict:
    """Loads ANY pickle artifact with the REFERENCE loader and predicts."""
    import pickle

    from ser._internal.models.artifact_envelope import deserialize_model_artifact

    with open(payload["path"], "rb") as handle:
        raw = pickle.load(handle)
    loaded = deserialize_model_artifact(raw)
    x = np.asarray(payload["x"], dtype=np.float64)
    return {
        "predictions": [str(p) for p in loaded.model.predict(x)],
        "expected_feature_size": loaded.expected_feature_size,
        "backend_id": (loaded.artifact_metadata or {}).get("backend_id"),
    }


def op_consents(payload: dict) -> dict:
    """Persists/loads the reference consent store (env-pinned path)."""
    import os

    os.environ["SER_DATASET_CONSENTS_FILE"] = payload["path"]
    from ser._internal.data import dataset_consents as dc

    settings = SimpleNamespace()  # env override wins before settings is read
    if payload.get("accept_policy_ids") or payload.get("accept_license_ids"):
        dc.persist_dataset_consents(
            settings=settings,
            accept_policy_ids=payload.get("accept_policy_ids"),
            accept_license_ids=payload.get("accept_license_ids"),
            source=payload.get("source", "oracle"),
        )
    loaded = dc.load_persisted_dataset_consents(settings=settings)
    return {
        "policy_consents": dict(loaded.policy_consents),
        "license_consents": dict(loaded.license_consents),
    }


def op_registry(payload: dict) -> dict:
    """Upserts/loads the reference dataset registry rooted at data_root."""
    from ser._internal.data import dataset_registry as dr

    settings = SimpleNamespace(
        models=SimpleNamespace(folder=Path(payload["data_root"]) / "models")
    )
    if payload.get("upsert"):
        entry = payload["upsert"]
        dr.upsert_dataset_registry_entry(
            settings=settings,
            dataset_id=entry["dataset_id"],
            dataset_root=Path(entry["dataset_root"]),
            manifest_path=Path(entry["manifest_path"]),
            options=entry.get("options"),
        )
    registry = dr.load_dataset_registry(settings=settings)
    return {
        dataset_id: {
            "dataset_root": str(item.dataset_root),
            "manifest_path": str(item.manifest_path),
            "options": dict(item.options),
        }
        for dataset_id, item in registry.items()
    }


def op_text_metrics(payload: dict) -> dict:
    from ser._internal.transcription import text_metrics as tm

    return {
        "tokens": [tm.normalize_words(text) for text in payload.get("texts", [])],
        "wer": [
            tm.compute_word_error_rate(ref, hyp)
            for ref, hyp in payload.get("pairs", [])
        ],
        "percentile": [
            tm.percentile(values, fraction)
            for values, fraction in payload.get("percentiles", [])
        ],
    }


def _ref_recipe():
    from ser._internal.data.recipe import research_recipe_v1

    return research_recipe_v1()


def _ref_audit_utterances(items: list[dict]):
    from ser._internal.data.manifest import Utterance as RefUtterance
    from ser._internal.data.manifest import VadTarget

    rows = []
    for item in items:
        vad = None
        if item.get("vad") is not None:
            v, a, d = item["vad"]
            vad = VadTarget(valence=v, arousal=a, dominance=d)
        rows.append(
            RefUtterance(
                schema_version=2,
                sample_id=item["sample_id"],
                corpus=item["corpus"],
                audio_path=Path(item.get("audio_path", "/tmp/a.wav")),
                label=item.get("label"),
                raw_label=item.get("raw_label"),
                vad=vad,
                social_attitude=item.get("social_attitude"),
                binary_affect=item.get("binary_affect"),
                transcript=item.get("transcript"),
                speaker_id=item.get("speaker_id"),
                session_id=item.get("session_id"),
                language=item.get("language"),
                split=item.get("split"),
                native_split=item.get("native_split"),
                normalized_audio_sha256=item.get("audio_sha256"),
                dataset_revision=item.get("revision"),
            )
        )
    return rows


def op_recipe_digest(payload: dict) -> dict:
    recipe = _ref_recipe()
    return {
        "recipe_id": recipe.recipe_id,
        "revision": recipe.revision,
        "ontology_version": recipe.ontology_version,
        "digest": recipe.digest,
        "record": recipe.to_record(),
    }


def op_plan_recipe_digest(payload: dict) -> str:
    """Reference prepared-plan recipe CONTENT digest
    (``training_orchestration.py:183-190``). Only ``settings.dataset.recipe``
    is consulted, so a namespace stub suffices."""
    from ser._internal.models.training_orchestration import _recipe_digest

    settings = SimpleNamespace(dataset=SimpleNamespace(recipe=payload["recipe"]))
    return _recipe_digest(settings)


def op_route_utterance(payload: dict) -> list[dict]:
    from ser._internal.data.recipe import route_utterance

    recipe = _ref_recipe()
    return [
        {
            "sample_id": routed.utterance.sample_id,
            "disposition": routed.disposition,
            "tasks": sorted(routed.tasks),
            "reason": routed.reason,
        }
        for routed in (
            route_utterance(row, recipe)
            for row in _ref_audit_utterances(payload["samples"])
        )
    ]


def op_audit_dataset_recipe(payload: dict) -> dict:
    from ser._internal.data.dataset_audit import audit_dataset_recipe

    report = audit_dataset_recipe(
        _ref_audit_utterances(payload["samples"]),
        recipe=_ref_recipe(),
        seed=payload["seed"],
        strict=payload["strict"],
    )
    return {
        "counters": dict(report.counters),
        "ledger": [
            {
                "sample_id": entry.sample_id,
                "corpus": entry.corpus,
                "split": entry.split,
                "group_id": entry.group_id,
                "tasks": list(entry.tasks),
                "disposition": entry.disposition,
                "reason": entry.reason,
            }
            for entry in report.ledger
        ],
    }


def op_dataset_catalog(payload: dict) -> dict:
    from ser._internal.data.dataset_prepare import SUPPORTED_DATASETS

    return {
        dataset_id: {
            "display_name": descriptor.display_name,
            "policy_id": descriptor.policy_id,
            "license_id": descriptor.license_id,
            "source_url": descriptor.source_url,
            "requires_manual_download": descriptor.requires_manual_download,
        }
        for dataset_id, descriptor in SUPPORTED_DATASETS.items()
    }


def _reference_exception(kind: str) -> Exception:
    """Builds one reference-taxonomy exception instance by symbolic kind."""
    if kind == "value_error":
        return ValueError("v")
    if kind == "file_not_found":
        return FileNotFoundError("f")
    if kind == "runtime_error":
        return RuntimeError("x")
    if kind == "unsupported_profile":
        from ser._internal.runtime.registry import UnsupportedProfileError

        return UnsupportedProfileError("u")
    if kind == "license":
        from ser._internal.license_check import BackendLicensePolicyError

        return BackendLicensePolicyError("l")
    if kind == "transcription":
        from ser._internal.transcript.transcript_extractor import TranscriptionError

        return TranscriptionError("tx")
    if kind.startswith("training_"):
        from ser._internal.models import training_readiness as ref_readiness

        cls = {
            "training_readiness": ref_readiness.TrainingReadinessError,
            "training_quarantine": ref_readiness.QuarantineBudgetExceeded,
            "training_prepared_plan": ref_readiness.PreparedPlanError,
        }[kind]
        return cls("t")
    profile, _, failure = kind.partition(":")
    module = __import__(
        f"ser._internal.runtime.{profile}_inference", fromlist=["_"]
    )
    prefix = profile.capitalize()
    cls_name = {
        "timeout": f"{prefix}InferenceTimeoutError",
        "execution": f"{prefix}InferenceExecutionError",
        "model_load": f"{prefix}ModelLoadError",
        "model_unavailable": f"{prefix}ModelUnavailableError",
        "dependency": f"{prefix}RuntimeDependencyError",
    }[failure]
    return getattr(module, cls_name)("e")


def op_capability_profiles(payload: dict) -> list[dict]:
    from ser._internal.data.dataset_capabilities import list_dataset_capability_profiles

    return [
        {
            "dataset_id": profile.dataset_id,
            "summary": profile.summary,
            "modalities": list(profile.modalities),
            "label_schema": profile.label_schema,
            "has_label_mapping": profile.has_label_mapping,
            "supervised_ser_candidate": profile.supervised_ser_candidate,
            "ssl_candidate": profile.ssl_candidate,
            "multimodal_candidate": profile.multimodal_candidate,
            "mergeable_with_emotion_ontology": profile.mergeable_with_emotion_ontology,
            "recommended_uses": list(profile.recommended_uses),
            "notes": list(profile.notes),
        }
        for profile in list_dataset_capability_profiles()
    ]


def _manifest_ontology(labels: list[str]):
    from ser._internal.data.ontology import LabelOntology

    return LabelOntology(
        ontology_id="parity_io",
        allowed_labels=frozenset(labels),
        unknown_label_policy="drop",
    )


def op_manifest_roundtrip(payload: dict) -> dict:
    """records → reference Utterances → written JSONL text + projections."""
    from ser._internal.data import manifest_jsonl as ref_manifest_jsonl
    from ser._internal.data.manifest import Utterance as RefUtterance

    base_dir = Path(payload["base_dir"])
    ontology = _manifest_ontology(payload["labels"])
    utterances = [
        RefUtterance.from_record(record, base_dir=base_dir, ontology=ontology)
        for record in payload["records"]
    ]
    with tempfile.TemporaryDirectory() as tmp:
        target = Path(tmp) / "m.jsonl"
        ref_manifest_jsonl.write_manifest_jsonl(target, utterances, base_dir=base_dir)
        text = target.read_text(encoding="utf-8")
    return {
        "text": text,
        "projections": [u.to_record() for u in utterances],
        "audio_paths": [str(u.audio_path) for u in utterances],
    }


def op_manifest_load(payload: dict) -> dict:
    """JSONL text → reference loader → canonical record projections."""
    from ser._internal.data import manifest_jsonl as ref_manifest_jsonl

    base_dir = Path(payload["base_dir"])
    ontology = _manifest_ontology(payload["labels"])
    with tempfile.TemporaryDirectory() as tmp:
        source = Path(tmp) / "m.jsonl"
        source.write_text(payload["text"], encoding="utf-8")
        utterances = ref_manifest_jsonl.load_manifest_jsonl(
            source, ontology=ontology, base_dir=base_dir
        )
    return {
        "projections": [u.to_record() for u in utterances],
        "audio_paths": [str(u.audio_path) for u in utterances],
    }


def op_manifest_from_record(payload: dict) -> dict:
    """One raw record → reference from_record → projection (or raise)."""
    from ser._internal.data.manifest import Utterance as RefUtterance

    utterance = RefUtterance.from_record(
        payload["record"],
        base_dir=Path(payload["base_dir"]),
        ontology=_manifest_ontology(payload["labels"]),
    )
    return {
        "projection": utterance.to_record(),
        "audio_path": str(utterance.audio_path),
        "split": utterance.split,
        "native_split": utterance.native_split,
        "label": utterance.label,
    }


def op_classify_inference_exception(payload: dict) -> dict:
    from ser._internal.runtime import commands as ref_commands

    disposition = ref_commands.classify_inference_exception(
        _reference_exception(payload["kind"])
    )
    return {
        "exit_code": disposition.exit_code,
        "include_traceback": disposition.include_traceback,
    }


def op_classify_training_exception(payload: dict) -> dict:
    from ser._internal.runtime import commands as ref_commands

    disposition = ref_commands.classify_training_exception(
        _reference_exception(payload["kind"])
    )
    return {
        "exit_code": disposition.exit_code,
        "include_traceback": disposition.include_traceback,
    }


def op_ravdess_reference_text(payload: dict) -> str | None:
    from ser._internal.transcript import profiling as ref_profiling

    return ref_profiling.ravdess_reference_text(Path(payload["path"]))


def op_stratified_subset(payload: dict) -> list[str]:
    from ser._internal.transcription import ravdess_references as ref_rr

    selected = ref_rr.stratified_reference_subset(
        [Path(p) for p in payload["paths"]],
        limit=payload["limit"],
        random_seed=payload["seed"],
    )
    return [str(p) for p in selected]


def op_subset_coverage(payload: dict) -> dict:
    from ser._internal.transcription import ravdess_references as ref_rr

    return ref_rr.summarize_subset_coverage([Path(p) for p in payload["paths"]])


def op_collect_reference_files(payload: dict) -> list[str]:
    from ser._internal.transcript import profiling as ref_profiling
    from ser._internal.transcription import ravdess_references as ref_rr

    files = ref_rr.collect_reference_files(
        glob_pattern="<fixture>",
        statement_text=ref_profiling.RAVDESS_STATEMENT_TEXT,
        limit=payload["limit"],
        sampling_strategy=payload["strategy"],
        random_seed=payload["seed"],
        glob_paths=lambda _pattern, _recursive: list(payload["paths"]),
    )
    return [str(p) for p in files]


def _ref_sampling_items(rows: list[dict]):
    from ser._internal.models import utterance_sampling as ref_sampling

    return [ref_sampling.UtteranceSamplingItem(**row) for row in rows]


def op_sampling_distribution(payload: dict) -> list[tuple[str, str, str, float]]:
    from ser._internal.models import utterance_sampling as ref_sampling

    rows = ref_sampling.utterance_sampling_distribution(
        _ref_sampling_items(payload["items"])
    )
    return [(r.sample_id, r.corpus, r.label, r.probability) for r in rows]


def op_sampling_contributions(payload: dict) -> dict:
    from ser._internal.models import utterance_sampling as ref_sampling

    return ref_sampling.sampling_contributions(_ref_sampling_items(payload["items"]))


def op_select_windows(payload: dict) -> tuple[int, ...]:
    from ser._internal.models import utterance_sampling as ref_sampling

    return ref_sampling.select_training_windows(
        sample_id=payload["sample_id"],
        window_count=payload["window_count"],
        max_windows=payload["max_windows"],
        seed=payload["seed"],
        epoch=payload["epoch"],
    )


_OPS = {
    "postprocess": op_postprocess,
    "windows": op_windows,
    "pool": op_pool,
    "overlap_mask": op_overlap_mask,
    "canonicalize": op_canonicalize,
    "build_timeline": op_build_timeline,
    "timeline_csv": op_timeline_csv,
    "classify_failure": op_classify_failure,
    "subtitles_render": op_subtitles_render,
    "subtitle_request": op_subtitle_request,
    "subtitle_cues": op_subtitle_cues,
    "resolve_profile": op_resolve_profile,
    "available_profiles": op_available_profiles,
    "catalog_snapshot": op_catalog_snapshot,
    "catalog_validate": op_catalog_validate,
    "artifact_names": op_artifact_names,
    "resolve_settings": op_resolve_settings,
    "ravdess_extract": op_ravdess_extract,
    "crema_extract": op_crema_extract,
    "remap_label": op_remap_label,
    "ravdess_utterances": op_ravdess_utterances,
    "ser_metrics": op_ser_metrics,
    "grouped_metrics": op_grouped_metrics,
    "segment_predictions": op_segment_predictions,
    "grouped_split": op_grouped_split,
    "speaker_cv": op_speaker_cv,
    "extract_speaker_id": op_extract_speaker_id,
    "hash_split": op_hash_split,
    "split_utterances": op_split_utterances,
    "split_utterances_three_way": op_split_utterances_three_way,
    "noise_controls": op_noise_controls,
    "clip_stability": op_clip_stability,
    "clip_label": op_clip_label,
    "compare_profiles": op_compare_profiles,
    "dataset_catalog": op_dataset_catalog,
    "csv_label_mappings": op_csv_label_mappings,
    "retry_policy": op_retry_policy,
    "text_metrics": op_text_metrics,
    "persist_artifact": op_persist_artifact,
    "medium_inference_once": op_medium_inference_once,
    "consents": op_consents,
    "registry": op_registry,
    "load_artifact": op_load_artifact,
    "recipe_digest": op_recipe_digest,
    "plan_recipe_digest": op_plan_recipe_digest,
    "route_utterance": op_route_utterance,
    "audit_dataset_recipe": op_audit_dataset_recipe,
    "capability_profiles": op_capability_profiles,
    "manifest_roundtrip": op_manifest_roundtrip,
    "manifest_load": op_manifest_load,
    "manifest_from_record": op_manifest_from_record,
    "classify_inference_exception": op_classify_inference_exception,
    "classify_training_exception": op_classify_training_exception,
    "ravdess_reference_text": op_ravdess_reference_text,
    "stratified_subset": op_stratified_subset,
    "subset_coverage": op_subset_coverage,
    "collect_reference_files": op_collect_reference_files,
    "sampling_distribution": op_sampling_distribution,
    "sampling_contributions": op_sampling_contributions,
    "select_windows": op_select_windows,
}


def main() -> None:
    stdin = sys.stdin.buffer
    stdout = sys.stdout.buffer
    while True:
        header = stdin.read(8)
        if len(header) < 8:
            return
        (length,) = struct.unpack(">Q", header)
        request = pickle.loads(stdin.read(length))
        op = request.pop("op")
        try:
            response = {"ok": _OPS[op](request)}
        except Exception as error:  # noqa: BLE001 - ship errors to the test side
            response = {"error": type(error).__name__, "message": str(error)}
        blob = pickle.dumps(response, protocol=pickle.HIGHEST_PROTOCOL)
        stdout.write(struct.pack(">Q", len(blob)))
        stdout.write(blob)
        stdout.flush()


if __name__ == "__main__":
    main()
